"""Source fixed rules and relation import/export.

Reference: CsvReader (fixed_rule/utilities/csv.rs:1-215), JsonReader
(utilities/jlines.rs:1-186), Constant (utilities/constant.rs:1-145),
::import/::export (runtime/db.rs:448-758).
"""

from cozo_spark.sources.readers import csv_reader, json_reader, constant  # noqa: F401
