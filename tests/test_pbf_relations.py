"""OSM PBF Relations: decode, multipolygon ring assembly (split outer ways
+ inner hole), area centroids, incomplete-geometry flags, admin-boundary
ingest into the PIP join — the reference's osmium 2-pass area mode
(03_import_pbf_optimized.py:90-135; admin boundaries 02_extract_alkis.py:
263-311) re-expressed as distributed joins + grouped-Arrow stitching."""

import pytest

from osm_coverage_spark.sources import pbf

# outer square 0.002° around (50.001, 6.001); hole 0.0005° at (50.0005, 6.0005)
OUTER = [(200, 50.0, 6.0), (201, 50.0, 6.002), (202, 50.002, 6.002),
         (203, 50.002, 6.0)]
HOLE = [(210, 50.00025, 6.00025), (211, 50.00025, 6.00075),
        (212, 50.00075, 6.00075), (213, 50.00075, 6.00025)]
# admin boundary square: lon 6.01..6.03, lat 50.01..50.03
ADMIN = [(220, 50.01, 6.01), (221, 50.01, 6.03), (222, 50.03, 6.03),
         (223, 50.03, 6.01)]
# node+way duplicate: same address tagged on a node AND its building way.
# The way is degenerate ([230, 230] — zero area), so way_centroids falls
# back to the vertex mean = bit-exactly the node's own coordinates, making
# the (street, housenumber, lat, lon) dedup key collide by construction.
DUP = [(230, 50.04, 6.04)]


@pytest.fixture(scope="module")
def rel_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pbfrel") / "relations.osm.pbf")
    dense = [
        {"id": i, "lat": la, "lon": lo}
        for i, la, lo in OUTER + HOLE + ADMIN + DUP
    ]
    dense[-1]["tags"] = {"addr:street": "Doppelt", "addr:housenumber": "7"}
    ways = [
        # outer ring split across two OPEN ways (stitching required),
        # second one reversed (endpoint matching must handle direction)
        {"id": 80, "refs": [200, 201, 202], "tags": {}},
        {"id": 81, "refs": [200, 203, 202], "tags": {}},
        # closed inner hole
        {"id": 82, "refs": [210, 211, 212, 213, 210], "tags": {}},
        # admin boundary ring, split in two
        {"id": 83, "refs": [220, 221, 222], "tags": {}},
        {"id": 84, "refs": [222, 223, 220], "tags": {}},
        # way with a ref that exists in no blob (clipped extract)
        {"id": 85, "refs": [200, 9999, 202, 200],
         "tags": {"addr:street": "Kaputt", "addr:housenumber": "1"}},
        # building way tagged with the SAME address as node 230 (see DUP):
        # degenerate ring -> centroid == node position bit-exactly
        {"id": 86, "refs": [230, 230],
         "tags": {"addr:street": "Doppelt", "addr:housenumber": "7",
                  "addr:city": "Stadt"}},
    ]
    relations = [
        {"id": 90,
         "tags": {"type": "multipolygon", "addr:street": "Hofanlage",
                  "addr:housenumber": "5", "addr:city": "Altstadt"},
         "members": [("outer", 1, 80), ("outer", 1, 81), ("inner", 1, 82)]},
        {"id": 91,
         "tags": {"type": "boundary", "boundary": "administrative",
                  "admin_level": "10", "name": "Mitte"},
         "members": [("outer", 1, 83), ("outer", 1, 84)]},
        # member way absent from the file -> geometry must be flagged
        {"id": 92,
         "tags": {"type": "multipolygon", "addr:street": "Verloren",
                  "addr:housenumber": "2"},
         "members": [("outer", 1, 999)]},
    ]
    pbf.write_pbf(path, dense, ways=ways, relations=relations)
    return path


def test_relation_decode(spark, rel_file):
    rels = {r["rel_id"]: r for r in pbf.pbf_relations(spark, [rel_file]).collect()}
    assert set(rels) == {90, 91, 92}
    r90 = rels[90]
    assert r90["rtype"] == "multipolygon" and r90["street"] == "Hofanlage"
    assert [(m["role"], m["mtype"], m["mid"]) for m in r90["members"]] == [
        ("outer", 1, 80), ("outer", 1, 81), ("inner", 1, 82)
    ]
    assert rels[91]["boundary"] == "administrative"
    assert rels[91]["admin_level"] == "10"


def _hole_centroid():
    a_o, a_h = 0.002 * 0.002, 0.0005 * 0.0005
    cx = (a_o * 6.001 - a_h * 6.0005) / (a_o - a_h)
    cy = (a_o * 50.001 - a_h * 50.0005) / (a_o - a_h)
    return cx, cy


def test_multipolygon_centroid_with_hole(spark, rel_file):
    rels = pbf.pbf_relations(spark, [rel_file])
    ways = pbf.pbf_ways(spark, [rel_file])
    nodes = pbf.pbf_nodes(spark, [rel_file])
    ctr = {r["rel_id"]: r
           for r in pbf.relation_area_centroids(rels, ways, nodes).collect()}
    cx, cy = _hole_centroid()
    assert ctr[90]["complete"] is True
    assert ctr[90]["c_lon"] == pytest.approx(cx, abs=1e-9)
    assert ctr[90]["c_lat"] == pytest.approx(cy, abs=1e-9)
    # missing member way -> flagged, not a plausible-but-wrong coordinate
    assert ctr[92]["complete"] is False
    assert ctr[92]["c_lon"] is None


def test_relation_addresses_in_pipeline(spark, rel_file):
    addrs = {(r["street"], r["housenumber"]): r
             for r in pbf.pbf_addresses(spark, [rel_file]).collect()}
    cx, cy = _hole_centroid()
    got = addrs[("Hofanlage", "5")]
    assert got["lon"] == pytest.approx(cx, abs=1e-9)
    assert got["lat"] == pytest.approx(cy, abs=1e-9)
    assert got["city"] == "Altstadt"
    # incomplete geometries are dropped like osmium's invalid-location skip
    assert ("Verloren", "2") not in addrs   # relation with missing member
    assert ("Kaputt", "1") not in addrs     # way with missing node ref


def test_incomplete_way_flagged(spark, rel_file):
    ways = pbf.pbf_ways(spark, [rel_file])
    nodes = pbf.pbf_nodes(spark, [rel_file])
    ctr = {r["way_id"]: r for r in pbf.way_centroids(ways, nodes).collect()}
    assert ctr[85]["complete"] is False and ctr[85]["c_lat"] is None
    assert ctr[82]["complete"] is True


def test_boundary_rings_feed_pip_join(spark, rel_file):
    from osm_coverage_spark.geo import pip

    rels = pbf.pbf_relations(spark, [rel_file])
    ways = pbf.pbf_ways(spark, [rel_file])
    nodes = pbf.pbf_nodes(spark, [rel_file])
    polys = pbf.relation_boundary_rings(rels, ways, nodes, admin_level="10")
    rows = polys.collect()
    assert [r["name"] for r in rows] == ["Mitte"]
    assert len(rows[0]["ring"]) == 5  # stitched closed ring (first repeated)

    points = spark.createDataFrame(
        [(1, 50.02, 6.02), (2, 50.05, 6.05)], "pid long, lat double, lon double"
    )
    out = {r["pid"]: r["name"]
           for r in pip.pip_join(points, polys, "pid", poly_name="name",
                                 fallback="draussen").collect()}
    assert out == {1: "Mitte", 2: "draussen"}


def test_pip_join_multi_ring_exclave(spark):
    """A name with TWO outer rings (exclave): points in EITHER ring must
    hit, and a point inside one ring must not be reported twice (r3 ADVICE:
    the broadcast dict used to keep only the last ring per name)."""
    from osm_coverage_spark.geo import pip

    def ring(lat0, lon0, d=0.01):
        return [
            {"lon": lon0, "lat": lat0},
            {"lon": lon0 + d, "lat": lat0},
            {"lon": lon0 + d, "lat": lat0 + d},
            {"lon": lon0, "lat": lat0 + d},
        ]

    polys = spark.createDataFrame(
        [("Enklave", ring(50.0, 6.0)), ("Enklave", ring(50.5, 6.5))],
        "name string, ring array<struct<lon double, lat double>>",
    )
    points = spark.createDataFrame(
        [(1, 50.005, 6.005), (2, 50.505, 6.505), (3, 50.25, 6.25)],
        "pid long, lat double, lon double",
    )
    rows = pip.pip_join(points, polys, "pid", poly_name="name",
                        fallback="draussen").collect()
    assert len(rows) == 3  # no duplicate hits
    out = {r["pid"]: r["name"] for r in rows}
    assert out == {1: "Enklave", 2: "Enklave", 3: "draussen"}


def test_blob_index_distributed_per_file_tasks(spark, rel_file, tmp_path):
    import shutil

    paths = [rel_file]
    for i in range(2):
        p = str(tmp_path / f"copy{i}.osm.pbf")
        shutil.copy(rel_file, p)
        paths.append(p)
    driver_idx = pbf.blob_index(spark, paths)  # below threshold: driver scan
    dist_idx = pbf.blob_index(spark, paths, distributed_threshold=2)
    a = sorted(map(tuple, driver_idx.collect()))
    b = sorted(map(tuple, dist_idx.collect()))
    assert a == b and len(a) >= 3
    # one header-scan task per file, not a serial driver loop
    assert dist_idx.rdd.getNumPartitions() == len(paths)


def test_import_pbf_one_pass_equals_direct(spark, rel_file, tmp_path):
    """The lake path (ONE wire decode → etype-partitioned parquet → query)
    must produce exactly the direct pipeline's addresses."""
    out = str(tmp_path / "imported")
    pbf.import_pbf(spark, [rel_file], out)
    direct = sorted(map(tuple, pbf.pbf_addresses(spark, [rel_file]).collect()))
    via_import = sorted(
        map(tuple, pbf.pbf_addresses_from_import(spark, out).collect())
    )
    assert direct == via_import and len(direct) > 0
    # the node+way duplicate address (node 230 / way 86) must come out
    # exactly ONCE on BOTH paths, with the deterministic survivor (the
    # node row: city "" sorts before the way row's "Stadt")
    dups = [t for t in via_import if t[0] == "Doppelt"]
    assert len(dups) == 1 and dups[0][3] == ""
    # partition pruning: each kind reads only its etype partition
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("etype=")
    ) == ["etype=node", "etype=relation", "etype=way"]


def test_blob_codec_lzma_and_unsupported():
    import lzma

    block = b"\x01\x02\x03\x04"  # opaque payload: codec layer only
    lz = pbf._enc_scalar(2, len(block)) + pbf._enc_bytes(4, lzma.compress(block))
    assert bytes(pbf._blob_data(lz)) == block
    zstd_blob = pbf._enc_scalar(2, len(block)) + pbf._enc_bytes(7, b"\x28\xb5")
    with pytest.raises(ValueError, match="zstd"):
        pbf._blob_data(zstd_blob)
