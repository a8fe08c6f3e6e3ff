"""Operator-level plan memoization.

A DataFrame is an immutable lazy plan; building one costs real driver time
(py4j round-trips per Column op — measured 1.0-1.5 s for the 64-perm MinHash
expression tree, guide §1/§7.3 "driver-side work"). Returning the SAME
DataFrame object for the same (input frame, params) removes that rebuild the
same way ``queries._t`` memoizes table reads and the engine's skeleton cache
memoizes compiled scripts. Execution is untouched: every action on the
memoized frame recomputes from the parquet inputs.

Keyed on ``id()`` of the input DataFrame(s) — safe because the memo holds a
strong reference (the id cannot be reused while the entry lives). Bounded
LRU so long-lived sessions (fuzz suites register thousands of frames) don't
accumulate plans.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from functools import wraps

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_MAXSIZE = 64


def plan_memo(fn):
    """Memoize a DataFrame-building operator on (input frames, params).

    Positional/keyword args that are DataFrames key on identity (and are
    pinned by the memo entry); everything else must be hashable.
    Non-hashable params or a stopped session fall through to a plain call.
    """
    cache: "OrderedDict[tuple, tuple]" = OrderedDict()

    @wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            key_parts = []
            pinned = []
            for a in args:
                if isinstance(a, DataFrame):
                    key_parts.append(("df", id(a)))
                    pinned.append(a)
                else:
                    key_parts.append(("v", a))
            for k in sorted(kwargs):
                v = kwargs[k]
                if isinstance(v, DataFrame):
                    key_parts.append((k, "df", id(v)))
                    pinned.append(v)
                else:
                    key_parts.append((k, "v", v))
            key = tuple(key_parts)
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        with _LOCK:
            hit = cache.get(key)
            if hit is not None:
                out, pins = hit
                # a memoized plan from a stopped session must not be served
                try:
                    if out.sparkSession._jsparkSession.sparkContext().isStopped():
                        cache.pop(key, None)
                        hit = None
                except Exception:
                    pass
                if hit is not None:
                    cache.move_to_end(key)
                    return out
        out = fn(*args, **kwargs)
        if isinstance(out, DataFrame):
            with _LOCK:
                cache[key] = (out, tuple(pinned))
                while len(cache) > _MAXSIZE:
                    cache.popitem(last=False)
        return out

    wrapper.__wrapped__ = fn
    return wrapper
