"""Air-routes parity on the reference's REAL dataset (3,504 airports /
50,637 routes from cozo-core/tests/air-routes-latest-{nodes,edges}.csv),
asserting the reference suite's own expected results
(cozo-core/tests/air_routes.rs — file:line cited per test).

The load replicates air_routes.rs:34-150: CsvReader over the node/edge
dumps, projected into airport/country/continent/contain/route relations.
"""

from __future__ import annotations

import pytest

NODES = "file:///root/reference/cozo-core/tests/air-routes-latest-nodes.csv"
EDGES = "file:///root/reference/cozo-core/tests/air-routes-latest-edges.csv"


@pytest.fixture(scope="module")
def adb(spark):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(f"""
    res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon] <~
        CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any', 'Any', 'Int?', 'Float?', 'Float?', 'Any', 'Any', 'Float?', 'Float?'],
                  url: '{NODES}', has_headers: true)
    ?[code, icao, desc, region, runways, longest, elev, country, city, lat, lon] :=
        res[idx, label, typ, code, icao, desc, region, runways, longest, elev, country, city, lat, lon],
        label == 'airport'
    :replace airport {{
        code: String => icao: String, desc: String, region: String, runways: Int,
        longest: Float, elev: Float, country: String, city: String, lat: Float, lon: Float
    }}
    """)
    db.run_script(f"""
    res[idx, label, typ, code, icao, desc] <~
        CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'], url: '{NODES}', has_headers: true)
    ?[code, desc] := res[idx, label, typ, code, icao, desc], label == 'country'
    :replace country {{ code: String => desc: String }}
    """)
    db.run_script(f"""
    res[idx, label, typ, code, icao, desc] <~
        CsvReader(types: ['Int', 'Any', 'Any', 'Any', 'Any', 'Any'], url: '{NODES}', has_headers: true)
    ?[code, desc] := res[idx, label, typ, code, icao, desc], label == 'continent'
    :replace continent {{ code: String => desc: String }}
    """)
    db.run_script(f"""
    res[idx, label, typ, code] <~
        CsvReader(types: ['Int', 'Any', 'Any', 'Any'], url: '{NODES}', has_headers: true)
    ?[idx, code] := res[idx, label, typ, code]
    :replace idx2code {{ idx: Int => code: String }}
    """)
    db.run_script(f"""
    res[] <~ CsvReader(types: ['Int', 'Int', 'Int', 'String', 'Float?'], url: '{EDGES}', has_headers: true)
    ?[fr, to, dist] := res[idx, fr_i, to_i, typ, dist], typ == 'route',
                       *idx2code[fr_i, fr], *idx2code[to_i, to]
    :replace route {{ fr: String, to: String => dist: Float }}
    """)
    db.run_script(f"""
    res[] <~ CsvReader(types: ['Int', 'Int', 'Int', 'String'], url: '{EDGES}', has_headers: true)
    ?[entity, contained] := res[idx, fr_i, to_i, typ], typ == 'contains',
                            *idx2code[fr_i, entity], *idx2code[to_i, contained]
    :replace contain {{ entity: String, contained: String }}
    """)
    db.run_script("::remove idx2code")
    return db


def rows(res):
    return sorted(tuple(r) for r in res.rows)


def test_load_counts(adb):
    assert adb.run_script("?[count(code)] := *airport{code}").rows[0][0] == 3504
    assert adb.run_script("?[count(fr)] := *route{fr}").rows[0][0] == 50637


def test_runway_distribution(adb):
    # air_routes.rs:446
    r = rows(adb.run_script("?[runways, count(code)] := *airport{code, runways}"))
    assert r == [(1, 2429), (2, 775), (3, 227), (4, 53), (5, 14), (6, 4), (7, 2)]


def test_starts_with(adb):
    # air_routes.rs:338
    r = rows(adb.run_script("?[code] := *airport{code}, starts_with(code, 'US')"))
    assert r == [("USA",), ("USH",), ("USJ",), ("USK",), ("USM",),
                 ("USN",), ("USQ",), ("UST",), ("USU",)]


def test_range_check(adb):
    # air_routes.rs:369
    r = rows(adb.run_script("""
    r[code, dist] := *airport{code}, *route{fr: code, dist}
    ?[dist] := r['PEK', dist], dist > 7000, dist <= 7722
    """))
    assert r == [(7176.0,), (7270.0,), (7311.0,), (7722.0,)]


def test_no_airports(adb):
    # air_routes.rs:391
    r = rows(adb.run_script("?[desc] := *country{code, desc}, not *airport{country: code}"))
    assert r == [("Andorra",), ("Liechtenstein",), ("Monaco",),
                 ("Pitcairn",), ("San Marino",)]


def test_no_routes_airport(adb):
    # air_routes.rs:419
    r = rows(adb.run_script(
        "?[code] := *airport{code}, not *route{fr: code}, not *route{to: code}"))
    assert [x[0] for x in r] == [
        "AFW", "APA", "APK", "BID", "BVS", "BWU", "CRC", "CVT", "EKA", "GYZ",
        "HFN", "HZK", "ILG", "INT", "ISL", "KGG", "NBW", "NFO", "PSY", "RIG",
        "SFD", "SFH", "SXF", "TUA", "TWB", "TXL", "VCV", "YEI"]


def test_most_routes_in_canada(adb):
    # air_routes.rs:622 (:order -n_routes :limit 10)
    r = adb.run_script("""
    ca_airports[code, count(code)] := *airport{code, country: 'CA'}, *route{fr: code}
    ?[code, city, n_routes] := ca_airports[code, n_routes], *airport{code, city}
    :order -n_routes
    :limit 10
    """)
    assert [list(x) for x in r.rows] == [
        ["YYZ", "Toronto", 195], ["YUL", "Montreal", 123],
        ["YVR", "Vancouver", 106], ["YYC", "Calgary", 75],
        ["YEG", "Edmonton", 48], ["YHZ", "Halifax", 45],
        ["YWG", "Winnipeg", 38], ["YOW", "Ottawa", 36],
        ["YZF", "Yellowknife", 21], ["YQB", "Quebec City", 20]]


def test_uk_count(adb):
    # air_routes.rs:658
    r = rows(adb.run_script("?[region, count(region)] := *airport{country: 'UK', region}"))
    assert r == [("GB-ENG", 27), ("GB-NIR", 3), ("GB-SCT", 25), ("GB-WLS", 3)]


def test_airports_by_country_shape(adb):
    # air_routes.rs:679 — multi-clause union incl. zero-airport countries
    r = adb.run_script("""
    airports_by_country[country, count(code)] := *airport{code, country}
    ?[country, count] := airports_by_country[country, count]
    ?[country, count] := *country{code: country}, not airports_by_country[country, _], count = 0
    :order count
    """)
    got = {c: n for c, n in (tuple(x) for x in r.rows)}
    assert len(r.rows) == 237
    assert got["US"] == 586 and got["CN"] == 217 and got["CA"] == 205
    assert got["AD"] == 0 and got["MC"] == 0  # no-airport countries included
    # :order count → first rows are the zero-count countries
    assert r.rows[0][1] == 0 and r.rows[-1][1] == 586


def test_n_airports_by_continent(adb):
    # air_routes.rs:732 — meet-max with a 0-count fallback clause
    r = rows(adb.run_script("""
    airports_by_continent[cont, count(code)] := *airport{code}, *contain[cont, code]
    ?[cont, max(count)] := *continent{code: cont}, airports_by_continent[cont, count]
    ?[cont, max(count)] := *continent{code: cont}, count = 0
    """))
    assert r == [("AF", 326), ("AN", 0), ("AS", 972), ("EU", 605),
                 ("NA", 994), ("OC", 305), ("SA", 339)]


def test_parallel_counts(adb):
    # air_routes.rs:189 — five aggregation rules over the same relation
    r = adb.run_script("""
    a[count(fr)] := *route{fr}
    b[count(fr)] := *route{fr}
    c[count(fr)] := *route{fr}
    d[count(fr)] := *route{fr}
    e[count(fr)] := *route{fr}
    ?[x] := a[a], b[b], c[c], d[d], e[e], x = a + b + c + d + e
    """)
    assert r.rows[0][0] == 50637 * 5


def test_const_return(adb):
    # air_routes.rs:826
    r = adb.run_script("?[name, count(code)] := *airport{code, region: 'US-OK'}, name = 'OK'")
    assert [list(x) for x in r.rows] == [["OK", 4]]


def test_multi_res(adb):
    # air_routes.rs:844
    r = adb.run_script("""
    total[count(code)] := *airport{code}
    high[count(code)] := *airport{code, runways}, runways >= 6
    low[count(code)] := *airport{code, runways}, runways <= 2
    four[count(code)] := *airport{code, runways}, runways == 4
    france[count(code)] := *airport{code, country: 'FR'}
    ?[total, high, low, four, france] := total[total], high[high], low[low],
                                              four[four], france[france]
    """)
    assert [list(x) for x in r.rows] == [[3504, 6, 3204, 53, 59]]


def test_multi_unification(adb):
    # air_routes.rs:872 — collect(code, 5) cap + `in` iteration
    r = rows(adb.run_script("""
    target_airports[collect(code, 5)] := *airport{code}
    ?[a, count(a)] := target_airports[targets], a in targets, *route{fr: a}
    """))
    assert r == [("AAA", 4), ("AAE", 8), ("AAL", 17), ("AAN", 5), ("AAQ", 11)]


def test_num_routes_from_eu_to_us(adb):
    # air_routes.rs:895 — unique() of pairs then length
    r = adb.run_script("""
    routes[unique(r)] := *contain['EU', fr],
                         *route{fr, to},
                         *airport{code: to, country: 'US'},
                         r = [fr, to]
    ?[n] := routes[rs], n = length(rs)
    """)
    assert r.rows[0][0] == 435


def test_num_airports_in_us_with_routes_from_eu(adb):
    # air_routes.rs:919
    r = adb.run_script("""
    ?[count_unique(to)] := *contain['EU', fr],
                           *route{fr, to},
                           *airport{code: to, country: 'US'}
    """)
    assert r.rows[0][0] == 45


def test_routes_from_eu_to_us_starting_with_l(adb):
    # air_routes.rs:962 — spot-check plus exact count
    r = rows(adb.run_script("""
    ?[eu_code, us_code] := *contain['EU', eu_code],
                           starts_with(eu_code, 'L'),
                           *route{fr: eu_code, to: us_code},
                           *airport{code: us_code, country: 'US'}
    """))
    assert len(r) == 53
    assert ("LGW", "AUS") in r and ("LIS", "SFO") in r and ("LHR", "SJC") in r


def test_dfs_bfs_real_graph(adb):
    # air_routes.rs:155/216 — PEK→LHR paths via DFS and BFS fixed rules
    for rule in ("DFS", "BFS"):
        r = adb.run_script(f"""
        starting[] <- [['PEK']]
        ?[] <~ {rule}(*route[], *airport[code], starting[], condition: (code == 'LHR'))
        """)
        assert len(r.rows) == 1
        row = list(r.rows[0])
        assert row[0] == "PEK" and row[1] == "LHR"
        assert row[2][0] == "PEK" and row[2][-1] == "LHR"


def test_london_to_us(adb):
    # air_routes.rs:1299
    r = rows(adb.run_script("""
    ?[fr, to] := fr in ['LHR', 'LCY', 'LGW', 'LTN', 'STN'],
                 *route{fr, to}, *airport{code: to, country: 'US'}
    """))
    assert len(r) == 48
    assert ("LGW", "AUS") in r and ("STN", "SFB") in r and ("LHR", "SLC") in r


def test_tx_to_ny(adb):
    # air_routes.rs:1334
    r = rows(adb.run_script("""
    ?[fr, to] := *airport{code: fr, region: 'US-TX'},
                 *route{fr, to}, *airport{code: to, region: 'US-NY'}
    """))
    assert r == [("AUS", "BUF"), ("AUS", "EWR"), ("AUS", "JFK"), ("DAL", "LGA"),
                 ("DFW", "BUF"), ("DFW", "EWR"), ("DFW", "JFK"), ("DFW", "LGA"),
                 ("HOU", "EWR"), ("HOU", "JFK"), ("HOU", "LGA"), ("IAH", "EWR"),
                 ("IAH", "JFK"), ("IAH", "LGA"), ("SAT", "EWR"), ("SAT", "JFK")]


def test_denver_to_mexico(adb):
    # air_routes.rs:1362
    r = rows(adb.run_script(
        "?[city] := *route{fr: 'DEN', to}, *airport{code: to, country: 'MX', city}"))
    assert [x[0] for x in r] == ["Cancun", "Cozumel", "Guadalajara", "Mexico City",
                                 "Monterrey", "Puerto Vallarta", "San José del Cabo"]


def test_three_cities(adb):
    # air_routes.rs:1389
    r = rows(adb.run_script("""
    three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
    ?[s, d] := three[s], *route{fr: s, to: d}, three[d]
    """))
    assert len(r) == 27
    assert ("CDG", "LHR") in r and ("MUC", "STN") in r and ("ORY", "LCY") in r


def test_len_of_names_count(adb):
    # air_routes.rs:1005 — sum of city-name lengths is a FLOAT (sum semantics)
    r = adb.run_script("""
    ?[sum(n)] := *route{fr: 'AUS', to},
                 *airport{code: to, city},
                 n = length(city)
    """)
    assert float(r.rows[0][0]) == 891.0


def test_group_count_by_out(adb):
    # air_routes.rs:1029 — zero-fallback meet-max + histogram + order/limit
    r = adb.run_script("""
    route_count[count(fr), fr] := *route{fr}
    rc[max(n), a] := route_count[n, a]
    rc[max(n), a] := *airport{code: a}, n = 0
    ?[n, count(a)] := rc[n, a]
    :order n
    :limit 10
    """)
    assert [list(x) for x in r.rows] == [
        [0, 29], [1, 777], [2, 649], [3, 357], [4, 234],
        [5, 149], [6, 140], [7, 100], [8, 73], [9, 64]]


def test_mean_group_count(adb):
    # air_routes.rs:1057 — disjunctive clause body inside a meet rule
    r = adb.run_script("""
    route_count[count(fr), fr] := *route{fr}
    rc[max(n), a] := route_count[n, a] or (*airport{code: a}, n = 0)
    ?[mean(n)] := rc[n, _]
    """)
    assert abs(float(r.rows[0][0]) - 14.451198630136986) < 1e-8


def test_n_routes_from_london_uk(adb):
    # air_routes.rs:1082
    r = rows(adb.run_script(
        "?[code, count(code)] := *airport{code, city: 'London', region: 'GB-ENG'}, *route{fr: code}"))
    assert r == [("LCY", 51), ("LGW", 232), ("LHR", 221), ("LTN", 130), ("STN", 211)]


def test_airport_most_routes(adb):
    # air_routes.rs:1664 — :order on an aggregate column
    r = adb.run_script("""
    ?[fr, count(fr)] := *route{fr}
    :order -count(fr)
    :limit 10
    """)
    assert [list(x) for x in r.rows] == [
        ["FRA", 310], ["IST", 309], ["CDG", 293], ["AMS", 283], ["MUC", 270],
        ["ORD", 265], ["DFW", 253], ["DXB", 248], ["PEK", 248], ["ATL", 242]]


def test_north_of_77(adb):
    # air_routes.rs:1692
    r = rows(adb.run_script(
        "?[city, latitude] := *airport{lat, city}, lat > 77, latitude = round(lat)"))
    assert r == [("Longyearbyen", 78.0), ("Qaanaaq", 77.0)]


def test_greenwich_meridian(adb):
    # air_routes.rs:1713
    r = rows(adb.run_script("?[code] := *airport{lon, code}, lon > -0.1, lon < 0.1"))
    assert [x[0] for x in r] == ["CDT", "LCY", "LDE", "LEH"]


def test_box_around_heathrow(adb):
    # air_routes.rs:1734
    r = rows(adb.run_script("""
    h_box[lon, lat] := *airport{code: 'LHR', lon, lat}
    ?[code] := h_box[lhr_lon, lhr_lat], *airport{code, lon, lat},
                abs(lhr_lon - lon) < 1, abs(lhr_lat - lat) < 1
    """))
    assert [x[0] for x in r] == ["LCY", "LGW", "LHR", "LTN", "SOU", "STN"]


def test_skip_limit_counts(adb):
    # air_routes.rs:1921 — dedup through set semantics; limit/offset counts
    # (the reference asserts exact rows from its sorted storage; an
    # unordered :limit here guarantees counts)
    r = rows(adb.run_script("?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3]"))
    assert r == [(3,), (4,), (5,), (6,), (7,), (8,), (9,)]
    assert len(adb.run_script(
        "?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3] :limit 2").rows) == 2
    assert len(adb.run_script(
        "?[a] := a in [9, 9, 8, 9, 8, 7, 7, 6, 5, 9, 4, 4, 3] :limit 100 :offset 1").rows) == 6
