"""GeoPackage scan: layer discovery, rowid-range parallel read, geometry
blob parse (point / polygon-with-hole centroid), EPSG:25832 → WGS84 via the
column-math inverse projection."""

import math

import pytest

from osm_coverage_spark.geo import crs
from osm_coverage_spark.sources import gpkg


@pytest.fixture(scope="module")
def gpkg_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gpkg") / "nw_x_GebauedeBauwerk_f.gpkg")
    # building footprints around a known WGS84 anchor, in EPSG:25832
    anchor = crs.utm32_py(50.7754, 6.0839)

    def sq(cx, cy, r):
        return [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r),
                (cx - r, cy + r), (cx - r, cy - r)]

    rows = []
    for i in range(300):
        cx = anchor[0] + (i % 20) * 50.0
        cy = anchor[1] + (i // 20) * 50.0
        rows.append(
            (f"Weg {i % 7}", str(i % 30 + 1), f"D{i % 3}",
             gpkg.wkb_polygon([sq(cx, cy, 8.0)]))
        )
    # polygon with a hole: centroid must account for the hole
    rows.append(("Hofweg", "99", "D9",
                 gpkg.wkb_polygon([sq(anchor[0] + 5000, anchor[1], 10.0),
                                   sq(anchor[0] + 5004, anchor[1] + 4, 2.0)])))
    # a plain point feature
    rows.append(("Punktweg", "7", "D7",
                 gpkg.wkb_point(anchor[0] + 6000, anchor[1] + 6000)))
    gpkg.write_gpkg(
        path, "nw_GebauedeBauwerk_lines", 25832,
        [("street", "TEXT"), ("housenumber", "TEXT"), ("district", "TEXT")],
        rows,
    )
    return path


def test_layer_discovery_substring(gpkg_file):
    layers = gpkg.gpkg_layers(gpkg_file)
    assert [l["table"] for l in layers] == ["nw_GebauedeBauwerk_lines"]
    assert gpkg.find_layer(gpkg_file, "GebauedeBauwerk")["srs_id"] == 25832
    assert gpkg.find_layer(gpkg_file, "nope") is None


def test_parallel_scan_and_centroids(spark, gpkg_file):
    df = gpkg.read_gpkg_layer(
        spark, gpkg_file, layer_contains="GebauedeBauwerk", batch_rows=64
    )
    collected = df.collect()
    # 300 grid squares + hole-polygon + point = 302 raw features; the
    # (street, housenumber) keys collide by construction (i%7 × i%30 →
    # only lcm=210 grid pairs + 2 specials = 212 distinct)
    assert len(collected) == 302
    rows = {(r["street"], r["housenumber"]): r for r in collected}
    assert len(rows) == 212
    anchor = crs.utm32_py(50.7754, 6.0839)
    # i=100 is the only fixture row with this key (collision pairs are
    # (i, i+210) for i<90): centroid = anchor + (100%20, 100//20)·50
    only = rows[("Weg 2", "11")]
    assert only["x"] == pytest.approx(anchor[0] + 0 * 50.0, abs=1e-6)
    assert only["y"] == pytest.approx(anchor[1] + 5 * 50.0, abs=1e-6)
    # hole shifts the centroid away from the hole quadrant
    h = rows[("Hofweg", "99")]
    area, hole = 400.0, 16.0
    exp_x = (area * (anchor[0] + 5000) - hole * (anchor[0] + 5004)) / (area - hole)
    assert h["x"] == pytest.approx(exp_x, abs=1e-6)
    assert rows[("Punktweg", "7")]["x"] == pytest.approx(anchor[0] + 6000, abs=1e-9)


def test_wgs84_reprojection_column_math(spark, gpkg_file):
    df = gpkg.with_wgs84(
        gpkg.read_gpkg_layer(spark, gpkg_file, layer_contains="GebauedeBauwerk")
    )
    r = df.filter("street = 'Weg 2' AND housenumber = '11'").collect()[0]
    anchor = crs.utm32_py(50.7754, 6.0839)
    exp_lat, exp_lon = crs.utm32_inverse_py(anchor[0], anchor[1] + 250.0)
    assert r["lat"] == pytest.approx(exp_lat, abs=1e-7)
    assert r["lon"] == pytest.approx(exp_lon, abs=1e-7)
    # plan stays JVM-side: no Python eval node for the reprojection
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") <= 1
    # (the single Arrow node is the sqlite scan itself, not the math)


def test_inverse_projection_roundtrip():
    for la, lo in [(47.5, 6.0), (50.7754, 6.0839), (55.0, 15.0)]:
        e, n = crs.utm32_py(la, lo)
        la2, lo2 = crs.utm32_inverse_py(e, n)
        assert abs(la2 - la) < 1e-8 and abs(lo2 - lo) < 1e-8


def test_bowtie_ring_repaired_like_buffer0():
    """Reference buffer(0) parity (02_extract_alkis.py:241-258): a figure-8
    ring whose naive shoelace cancels to ~0 must split into its two lobes
    and yield the union-of-lobes centroid, not None/garbage."""
    bow = [(0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (2.0, 2.0), (0.0, 0.0)]
    pt = gpkg.parse_gpkg_geometry(
        gpkg._gpkg_blob(gpkg.wkb_polygon([bow]), 0)
    )
    # lobes: triangles of equal area 1 with centroids (1, 1/3) and (1, 5/3)
    assert pt == (pytest.approx(1.0), pytest.approx(1.0))

    loops = gpkg.repair_ring(bow)
    assert len(loops) == 2
    assert all(loop[0] == loop[-1] and len(loop) >= 4 for loop in loops)

    # a valid ring passes through unchanged
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    assert gpkg.repair_ring(sq) == [sq]


def test_sparse_rowids_bounded_splits(spark, tmp_path):
    """ADVICE r2: rowids with huge gaps (deletes / big INTEGER PRIMARY
    KEYs) must not explode the driver-side split list — splits derive from
    ACTUAL rowids, capped, and still return every row."""
    import sqlite3

    path = str(tmp_path / "sparse.gpkg")
    rows = [(f"S{i}", "1", "D", gpkg.wkb_point(float(i), 0.0))
            for i in range(40)]
    gpkg.write_gpkg(path, "feats", 4326,
                    [("street", "TEXT"), ("housenumber", "TEXT"),
                     ("district", "TEXT")], rows)
    con = sqlite3.connect(path)
    # blow the rowids apart: gaps of ~25 billion between consecutive rows
    con.execute("UPDATE feats SET rowid = rowid * 25000000000")
    con.commit()
    con.close()
    df = gpkg.read_gpkg_layer(spark, path, layer="feats", batch_rows=8)
    assert df.rdd.getNumPartitions() <= 40  # not span/batch_rows ≈ 10^11
    assert df.count() == 40
    assert {r["street"] for r in df.collect()} == {f"S{i}" for i in range(40)}
    path = str(tmp_path / "empty.gpkg")
    gpkg.write_gpkg(path, "feats", 4326, [("a", "TEXT")], [])
    df = gpkg.read_gpkg_layer(spark, path, layer="feats")
    assert df.count() == 0
