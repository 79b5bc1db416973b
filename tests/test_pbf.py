"""OSM PBF reader: blob-split scan, dense/plain node decode, tag-filter
semantics (03_import_pbf_optimized.py:58-88), way shoelace centroids."""

import pytest

from osm_coverage_spark.sources import pbf


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    dense = [
        # full address node
        {"id": 1, "lat": 50.1000000, "lon": 6.2000000,
         "tags": {"addr:street": "Lindenallee", "addr:housenumber": "12",
                  "addr:city": "Dorf"}},
        # place-based address (street absent -> place is the street value)
        {"id": 2, "lat": 50.1000100, "lon": 6.2000100,
         "tags": {"addr:place": "Gutshof", "addr:housenumber": "3"}},
        # housenumber without street/place -> dropped
        {"id": 3, "lat": 50.2, "lon": 6.3, "tags": {"addr:housenumber": "9"}},
        # street without housenumber -> dropped
        {"id": 4, "lat": 50.3, "lon": 6.4, "tags": {"addr:street": "Leer"}},
        # housename: name starting with 'Haus'
        {"id": 5, "lat": 50.4000000, "lon": 6.5000000,
         "tags": {"addr:street": "Bergweg", "addr:housenumber": "7",
                  "name": "Haus Sonnenschein"}},
        # name NOT starting with 'haus' -> housename null
        {"id": 6, "lat": 50.5, "lon": 6.6,
         "tags": {"addr:street": "Talweg", "addr:housenumber": "8",
                  "name": "Gasthof Adler"}},
        # exact duplicate of node 1's (street, hnr, lat, lon) with a
        # different city -> flush_buffer-parity dedup keeps ONE row,
        # deterministically the lexicographically smaller city
        {"id": 7, "lat": 50.1000000, "lon": 6.2000000,
         "tags": {"addr:street": "Lindenallee", "addr:housenumber": "12",
                  "addr:city": "Zweitdorf"}},
    ]
    # untagged vertices of a closed square way (1e-3 deg edges)
    corners = [
        (100, 50.0, 6.0),
        (101, 50.0, 6.001),
        (102, 50.001, 6.001),
        (103, 50.001, 6.0),
    ]
    dense += [{"id": i, "lat": la, "lon": lo} for i, la, lo in corners]
    # bulk filler so the encoder splits into multiple blobs
    dense += [
        {"id": 1000 + i, "lat": 51.0 + i * 1e-5, "lon": 7.0 + i * 1e-5}
        for i in range(600)
    ]
    plain = [
        {"id": 9000, "lat": 52.5000000, "lon": 13.4000000,
         "tags": {"addr:street": "Plain-Straße", "addr:housenumber": "1a",
                  "addr:city": "Stadt"}},
    ]
    ways = [
        # closed square with address tags -> shoelace centroid
        {"id": 70, "refs": [100, 101, 102, 103, 100],
         "tags": {"addr:street": "Hofplatz", "addr:housenumber": "2"}},
        # untagged way -> dropped
        {"id": 71, "refs": [100, 101], "tags": {}},
    ]
    pbf.write_pbf(path, dense, ways=ways, plain_nodes=plain, blob_size=2000)
    return path


def test_blob_index_splits_file(spark, pbf_file):
    idx = pbf.blob_index(spark, [pbf_file])
    assert idx.count() >= 2  # multiple OSMData blobs = multiple tasks


def test_node_decode_roundtrip(spark, pbf_file):
    nodes = pbf.pbf_nodes(spark, [pbf_file])
    rows = {r["node_id"]: r for r in nodes.collect()}
    assert len(rows) == 7 + 4 + 600 + 1
    r1 = rows[1]
    assert (r1["lat"], r1["lon"]) == (50.1, 6.2)
    assert r1["street"] == "Lindenallee" and r1["housenumber"] == "12"
    assert rows[100]["street"] is None  # untagged vertex kept for joins
    assert rows[9000]["street"] == "Plain-Straße"  # plain (non-dense) node


def test_address_tag_filter_semantics(spark, pbf_file):
    addrs = pbf.pbf_addresses(spark, [pbf_file])
    rows = {(r["street"], r["housenumber"]): r for r in addrs.collect()}
    assert set(rows) == {
        ("Lindenallee", "12"),
        ("Gutshof", "3"),          # place fallback
        ("Bergweg", "7"),
        ("Talweg", "8"),
        ("Plain-Straße", "1a"),
        ("Hofplatz", "2"),         # the closed way
    }
    assert rows[("Bergweg", "7")]["housename"] == "Haus Sonnenschein"
    assert rows[("Talweg", "8")]["housename"] is None
    assert rows[("Lindenallee", "12")]["city"] == "Dorf"
    assert rows[("Gutshof", "3")]["city"] == ""


def test_duplicate_address_rows_deduped(spark, pbf_file):
    """Same (street, housenumber, lat, lon) tagged twice (node 1 + node 7)
    → one output row, deterministic survivor (min city)."""
    addrs = pbf.pbf_addresses(spark, [pbf_file])
    dup = addrs.filter("street = 'Lindenallee' AND housenumber = '12'").collect()
    assert len(dup) == 1
    assert dup[0]["city"] == "Dorf"


def test_way_shoelace_centroid_exact(spark, pbf_file):
    addrs = pbf.pbf_addresses(spark, [pbf_file])
    way = addrs.filter("street = 'Hofplatz'").collect()[0]
    assert way["lat"] == pytest.approx(50.0005, abs=1e-9)
    assert way["lon"] == pytest.approx(6.0005, abs=1e-9)


def test_degenerate_ring_falls_back_to_vertex_mean(spark, pbf_file):
    from pyspark.sql import functions as F

    nodes = pbf.pbf_nodes(spark, [pbf_file])
    line = spark.createDataFrame(
        [(80, [100, 101])], "way_id long, refs array<long>"
    )
    ctr = pbf.way_centroids(line, nodes).collect()[0]
    assert ctr["c_lat"] == pytest.approx(50.0, abs=1e-9)
    assert ctr["c_lon"] == pytest.approx(6.0005, abs=1e-9)
