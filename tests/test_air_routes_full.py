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


def test_long_distance_from_lgw(adb):
    # air_routes.rs:1420
    r = rows(adb.run_script("""
    ?[city, dist] := *route{fr: 'LGW', to, dist},
                     dist > 4000, *airport{code: to, city}
    """))
    assert len(r) == 42
    assert ("Austin", 4921.0) in r and ("Singapore", 6751.0) in r


def test_long_routes_one_dir(adb):
    # air_routes.rs:1453
    r = rows(adb.run_script("?[fr, dist, to] := *route{fr, to, dist}, dist > 8000, fr < to"))
    assert len(r) == 32
    assert ("EWR", 9523.0, "SIN") in r and ("LHR", 9009.0, "PER") in r


def test_longest_routes(adb):
    # air_routes.rs:1484 — :sort -dist :limit 20
    r = adb.run_script("""
    ?[fr, dist, to] := *route{fr, to, dist}, dist > 4000, fr < to
    :sort -dist
    :limit 20
    """)
    assert [list(x) for x in r.rows][:6] == [
        ["JFK", 9526.0, "SIN"], ["EWR", 9523.0, "SIN"], ["AKL", 9025.0, "DOH"],
        ["LHR", 9009.0, "PER"], ["PEK", 8884.0, "PTY"], ["AKL", 8818.0, "DXB"]]
    assert len(r.rows) == 20


def test_total_distance_from_three_cities(adb):
    # air_routes.rs:1546
    r = adb.run_script("""
    three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
    ?[sum(dist)] := three[a], *route{fr: a, dist}
    """)
    assert float(r.rows[0][0]) == 2739039.0


def test_total_distance_within_three_cities(adb):
    # air_routes.rs:1568
    r = adb.run_script("""
    three[code] := city in ['London', 'Munich', 'Paris'], *airport{code, city}
    ?[sum(dist)] := three[a], *route{fr: a, dist, to}, three[to]
    """)
    assert float(r.rows[0][0]) == 10282.0


def test_specific_distance(adb):
    # air_routes.rs:1590
    r = adb.run_script("?[dist] := *route{fr: 'AUS', to: 'MEX', dist}")
    assert [list(x) for x in r.rows] == [[748.0]]


def test_n_routes_between(adb):
    # air_routes.rs:1611
    r = adb.run_script("""
    us_a[a] := *contain['US', a]
    ?[count(fr)] := *route{fr, to, dist}, dist >= 100, dist <= 200,
                    us_a[fr], us_a[to]
    """)
    assert r.rows[0][0] == 597


def test_one_stop_distance(adb):
    # air_routes.rs:1634 — :order on a computed sum
    r = adb.run_script("""
    ?[code, dist] := *route{fr: 'AUS', to: code, dist: dis1},
                     *route{fr: code, to: 'LHR', dist: dis2},
                     dist = dis1 + dis2
    :order dist
    :limit 10
    """)
    assert [list(x) for x in r.rows] == [
        ["DTW", 4893.0], ["YYZ", 4901.0], ["ORD", 4912.0], ["PIT", 4916.0],
        ["BNA", 4923.0], ["DFW", 4926.0], ["BOS", 4944.0], ["EWR", 4953.0],
        ["IAD", 4959.0], ["JFK", 4960.0]]


def test_great_circle_distance(adb):
    # air_routes.rs:1789 — haversine_deg_input
    r = adb.run_script("""
    ?[deg_diff] := *airport{code: 'SFO', lat: a_lat, lon: a_lon},
                   *airport{code: 'NRT', lat: b_lat, lon: b_lon},
                    deg_diff = round(haversine_deg_input(a_lat, a_lon, b_lat, b_lon))
    """)
    assert [list(x) for x in r.rows] == [[1.0]]


def test_na_from_india(adb):
    # air_routes.rs:1247
    r = rows(adb.run_script("""
    ?[ind_a, na_a] := *airport{code: ind_a, country: 'IN'},
                      *route{fr: ind_a, to: na_a},
                      *airport{code: na_a, country},
                      country in ['US', 'CA']
    """))
    assert r == [("BOM", "EWR"), ("BOM", "JFK"), ("BOM", "YYZ"), ("DEL", "EWR"),
                 ("DEL", "IAD"), ("DEL", "JFK"), ("DEL", "ORD"), ("DEL", "SFO"),
                 ("DEL", "YVR"), ("DEL", "YYZ")]


def test_dfw_by_region(adb):
    # air_routes.rs:1758 — collect() of route targets grouped by region
    r = adb.run_script("""
    ?[region, collect(to)] := *route{fr: 'DFW', to},
                              *airport{code: to, country: 'US', region},
                              region in ['US-CA', 'US-TX', 'US-FL', 'US-CO', 'US-IL']
    """)
    got = {row[0]: sorted(row[1]) for row in r.rows}
    assert got["US-CO"] == ["ASE", "COS", "DEN", "DRO", "EGE", "GJT", "GUC", "HDN", "MTJ"]
    assert got["US-IL"] == ["BMI", "CMI", "MLI", "ORD", "PIA", "SPI"]
    assert len(got["US-TX"]) == 23 and len(got["US-CA"]) == 14


def test_aus_to_edi_shortest(adb):
    # air_routes.rs:1812 — shortest() meet aggregation inside recursion
    r = adb.run_script("""
    us_uk_airports[code] := *airport{code, country: 'UK'}
    us_uk_airports[code] := *airport{code, country: 'US'}
    routes[to, shortest(path)] := *route{fr: 'AUS', to}, us_uk_airports[to],
                                    path = ['AUS', to]
    routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
                                    us_uk_airports[to],
                                    path = append(prev, to)
    ?[path] := routes['EDI', path]
    """)
    assert [list(x) for x in r.rows] == [[["AUS", "BOS", "EDI"]]]


def test_furthest_from_lhr(adb):
    # air_routes.rs:1882 — min_cost() meet over [path, cost] pairs, then
    # :order -cost :limit 10 (NB min_cost keeps the CHEAPEST pair per key;
    # the query surfaces the most expensive of those optima)
    r = adb.run_script("""
    routes[to, min_cost(cost_pair)] := *route{fr: 'LHR', to, dist},
                                         path = ['LHR', to],
                                         cost_pair = [path, dist]
    routes[to, min_cost(cost_pair)] := routes[a, prev], *route{fr: a, to, dist},
                                       path = append(first(prev), to),
                                       cost_pair = [path, last(prev) + dist]
    ?[cost, path] := routes[dst, cost_pair], cost = last(cost_pair), path = first(cost_pair)
    :order -cost
    :limit 10
    """)
    got = [list(x) for x in r.rows]
    assert got[0] == [12922.0, ["LHR", "JNB", "HLE", "ASI", "BZZ"]]
    assert [g[0] for g in got] == [12922.0, 12093.0, 12015.0, 12009.0, 11910.0,
                                   11900.0, 11805.0, 11766.0, 11758.0, 11751.0]


def test_reachable_from_lhr(adb):
    # air_routes.rs:1840 — shortest() meet over growing paths, then the 10
    # LONGEST shortest-paths (tie order = stored-tuple order)
    r = adb.run_script("""
    routes[to, shortest(path)] := *route{fr: 'LHR', to},
                                  path = ['LHR', to]
    routes[to, shortest(path)] := routes[a, prev], *route{fr: a, to},
                                  path = append(prev, to)
    ?[len, path] := routes[_, path], len = length(path)
    :order -len
    :limit 10
    """)
    got = [list(x) for x in r.rows]
    assert got[0] == [8, ["LHR", "YYZ", "YTS", "YMO", "YFA", "ZKE", "YAT", "YPO"]]
    assert [g[0] for g in got] == [8, 7, 7, 7, 7, 7, 7, 7, 7, 7]
    # among equal-length shortest paths the reference keeps its first-found
    # tie and we keep the lexicographic minimum — the DESTINATIONS (whose
    # shortest length is unique) must agree exactly (air_routes.rs:1860-1878)
    assert sorted(g[1][-1] for g in got) == sorted(
        ["YPO", "BVI", "XTG", "PTJ", "PTH", "RDV", "SLQ", "WWT", "THU", "YZG"])


def test_hard_route_finding(adb):
    # air_routes.rs:1188 — choice() inside recursion with an excluded node;
    # the specific path is insertion-order-dependent in the reference, so we
    # assert validity: reaches YPO from AUS without YYZ
    r = adb.run_script("""
    reachable[to, choice(p)] := *route{fr: 'AUS', to}, to != 'YYZ', p = ['AUS', to]
    reachable[to, choice(p)] := reachable[b, prev], *route{fr: b, to},
                                to != 'YYZ', p = append(prev, to)
    ?[p] := reachable['YPO', p]
    :limit 1
    """)
    assert len(r.rows) == 1
    path = list(r.rows[0][0])
    assert path[0] == "AUS" and path[-1] == "YPO" and "YYZ" not in path


def test_most_out_routes_both_head_orders(adb):
    # air_routes.rs:475/508 — same aggregation with both head orders
    expect_top = [["FRA", 310], ["IST", 309], ["CDG", 293], ["AMS", 283], ["MUC", 270]]
    r1 = adb.run_script("""
    route_count[fr, count(fr)] := *route{fr}
    ?[code, n] := route_count[code, n], n > 180
    :sort -n
    """)
    assert len(r1.rows) == 35 and [list(x) for x in r1.rows[:5]] == expect_top
    r2 = adb.run_script("""
    route_count[count(fr), fr] := *route{fr}
    ?[code, n] := route_count[n, code], n > 180
    :sort -n
    """)
    assert [list(x) for x in r2.rows] == [list(x) for x in r1.rows]


def test_most_routes_in_and_out(adb):
    # air_routes.rs:539 — two clauses aggregate in+out degree together
    r = adb.run_script("""
    route_count[a, count(a)] := *route{fr: a}
    route_count[a, count(a)] := *route{to: a}
    ?[code, n] := route_count[code, n], n > 400
    :sort -n
    """)
    got = [list(x) for x in r.rows]
    assert got[:4] == [["FRA", 620], ["IST", 618], ["CDG", 587], ["AMS", 568]]
    assert len(got) == 25 and got[-1] == ["FCO", 402]


def test_airport_with_one_route(adb):
    # air_routes.rs:570
    r = adb.run_script("""
    route_count[fr, count(fr)] := *route{fr}
    ?[count(a)] := route_count[a, n], n == 1
    """)
    assert r.rows[0][0] == 777


def test_single_runway_with_most_routes(adb):
    # air_routes.rs:589
    r = adb.run_script("""
    single_or_lgw[code] := code = 'LGW'
    single_or_lgw[code] := *airport{code, runways}, runways == 1
    out_counts[a, count(a)] := single_or_lgw[a], *route{fr: a}
    ?[code, city, out_n] := out_counts[code, out_n], *airport{code, city}
    :order -out_n
    :limit 10
    """)
    assert [list(x) for x in r.rows] == [
        ["LGW", "London", 232], ["STN", "London", 211], ["CTU", "Chengdu", 139],
        ["LIS", "Lisbon", 139], ["BHX", "Birmingham", 130], ["LTN", "London", 130],
        ["SZX", "Shenzhen", 129], ["CKG", "Chongqing", 122],
        ["STR", "Stuttgart", 121], ["CRL", "Brussels", 117]]


def test_airports_by_route_number(adb):
    # air_routes.rs:783 — collect() at an exact count
    r = adb.run_script("""
    route_count[fr, count(fr)] := *route{fr}
    ?[n, collect(code)] := route_count[code, n], n = 106
    """)
    assert [[r.rows[0][0], sorted(r.rows[0][1])]] == [[106, ["TFS", "YVR"]]]


def test_out_from_aus(adb):
    # air_routes.rs:802 — nested aggregations + collect of pairs
    r = adb.run_script("""
    out_by_runways[runways, count(code)] := *route{fr: 'AUS', to: code}, *airport{code, runways}
    two_hops[count(a)] := *route{fr: 'AUS', to: a}, *route{fr: a}
    ?[max(total), collect(coll)] := two_hops[total], out_by_runways[n, ct], coll = [n, ct]
    """)
    total, colls = r.rows[0][0], sorted([list(c) for c in r.rows[0][1]])
    assert total == 8354
    assert colls == [[1, 9], [2, 24], [3, 30], [4, 24], [5, 5], [6, 4], [7, 2]]


def test_routes_within_england(adb):
    # air_routes.rs:1123
    r = rows(adb.run_script("""
    eng_aps[code] := *airport{code, region: 'GB-ENG'}
    ?[fr, to] := eng_aps[fr], *route{fr, to}, eng_aps[to]
    """))
    assert len(r) == 54
    assert ("BHX", "NCL") in r and ("SOU", "NCL") in r


def test_routes_within_england_no_dup(adb):
    # air_routes.rs:1157 — sorted() pair dedup through set semantics
    r = adb.run_script("""
    eng_aps[code] := *airport{code, region: 'GB-ENG'}
    ?[pair] := eng_aps[fr], *route{fr, to}, eng_aps[to], pair = sorted([fr, to])
    """)
    pairs = sorted(tuple(x[0]) for x in r.rows)
    assert len(pairs) == 27
    assert ("BHX", "NCL") in pairs and ("NQY", "SEN") in pairs


def test_eu_cities_reachable_from_fll(adb):
    # air_routes.rs:1247
    r = rows(adb.run_script(
        "?[city] := *route{fr: 'FLL', to}, *contain['EU', to], *airport{code: to, city}"))
    assert [x[0] for x in r] == ["Barcelona", "Copenhagen", "London", "Madrid",
                                 "Oslo", "Paris", "Stockholm"]


def test_clt_to_eu_or_sa(adb):
    # air_routes.rs:1273
    r = rows(adb.run_script(
        "?[to] := *route{fr: 'CLT', to}, c_name in ['EU', 'SA'], *contain[c_name, to]"))
    assert [x[0] for x in r] == ["BCN", "CDG", "DUB", "FCO", "FRA",
                                 "GIG", "GRU", "LHR", "MAD", "MUC"]


def test_fixed_rules_on_real_graph(adb):
    # air_routes.rs:236-320 runs these without asserts; we assert sanity on
    # the same 3.5k-node / 50k-edge graph
    r = adb.run_script("""
    deg_centrality[] <~ DegreeCentrality(*route[a, b])
    ?[total, out, in] := deg_centrality[node, total, out, in]
    :order -total
    :limit 10
    """)
    assert len(r.rows) == 10 and r.rows[0][0] == 620  # FRA in+out

    r2 = adb.run_script("""
    res[] <~ ConnectedComponents(*route[], *airport[code])
    ?[grp, code] := res[code, grp], grp != 0
    """)
    assert len(r2.rows) >= 0  # ran; membership is label-dependent

    r3 = adb.run_script("""
    starting[] <- [['JFK']]
    ending[] <- [['KUL']]
    res[] <~ ShortestPathDijkstra(*route[], starting[], ending[])
    ?[path] := res[src, dst, cost, path]
    """)
    assert len(r3.rows) == 1
    p = list(r3.rows[0][0])
    assert p[0] == "JFK" and p[-1] == "KUL"

    r4 = adb.run_script("""
    starting[] <- [['PEK']]
    ending[] <- [['SIN']]
    ?[] <~ KShortestPathYen(*route[], starting[], ending[], k: 5)
    """)
    assert 1 <= len(r4.rows) <= 5
    assert all(row[3][0] == "PEK" and row[3][-1] == "SIN" for row in r4.rows)

    r5 = adb.run_script("""
    code_lat_lon[code, lat, lon] := *airport{code, lat, lon}
    starting[code, lat, lon] := code = 'HFE', *airport{code, lat, lon}
    goal[code, lat, lon] := code = 'LHR', *airport{code, lat, lon}
    ?[] <~ ShortestPathAStar(*route[], code_lat_lon[node, lat1, lon1], starting[], goal[goal, lat2, lon2],
                             heuristic: haversine_deg_input(lat1, lon1, lat2, lon2) * 3963)
    """)
    assert len(r5.rows) == 1
    assert r5.rows[0][0] == "HFE" and r5.rows[0][1] == "LHR"


def test_empty_const_rule_errors(adb):
    # air_routes.rs:178-186: `?[id, name] <- [[]]` must error (arity 0 rows
    # against a 2-column head)
    from cozo_spark.datalog.translate import QueryError

    with pytest.raises(QueryError):
        adb.run_script("?[id, name] <- [[]]")


def test_routes_per_airport(adb):
    # air_routes.rs:758-780 — note the `++`-built constant in the const rule
    r = adb.run_script("""
    given[] <- [['A' ++ 'U' ++ 'S'],['AMS'],['JFK'],['DUB'],['MEX']]
    ?[code, count(code)] := given[code], *route{fr: code}
    """)
    assert rows(r) == [("AMS", 283), ("AUS", 98), ("DUB", 185),
                       ("JFK", 204), ("MEX", 116)]


def test_num_routes_in_us_airports_from_eu(adb):
    # air_routes.rs:937-965 (spot-check endpoints + total row count)
    r = adb.run_script("""
    ?[to, count(to)] := *contain['EU', fr], *route{fr, to},
                        *airport{code: to, country: 'US'}
    :order count(to);
    """)
    got = [tuple(x) for x in r.rows]
    assert len(got) == 45
    assert got[0][1] == 1 and got[-1] == ("EWR", 43)
    d = dict(got)
    assert d["JFK"] == 42 and d["MIA"] == 28 and d["ANC"] == 1


def test_reachable_from_london_uk_in_two_hops(adb):
    # air_routes.rs:1103-1120
    r = adb.run_script("""
    lon_uk_airports[code] := *airport{code, city: 'London', region: 'GB-ENG'}
    one_hop[to] := lon_uk_airports[fr], *route{fr, to}, not lon_uk_airports[to];
    ?[count_unique(a3)] := one_hop[a2], *route{fr: a2, to: a3}, not lon_uk_airports[a3];
    """)
    assert r.rows == [[2353]]


def test_longest_routes_from_each_airports(adb):
    # air_routes.rs:1518-1543 — max + choice in one head; the reference's
    # unordered :limit walks the BTree in fr order, our engine makes the
    # same window deterministic with an explicit :order fr
    r = adb.run_script("""
    ?[fr, max(dist), choice(to)] := *route{fr, dist, to}
    :order fr
    :limit 10;
    """)
    assert [tuple(x) for x in r.rows] == [
        ("AAA", 968.0, "FAC"), ("AAE", 1161.0, "ALG"),
        ("AAL", 1693.0, "AAR"), ("AAN", 1613.0, "CAI"),
        ("AAQ", 2122.0, "BAX"), ("AAR", 1585.0, "AAL"),
        ("AAT", 267.0, "URC"), ("AAX", 69.0, "POJ"),
        ("AAY", 531.0, "SAH"), ("ABA", 2096.0, "DME")]
