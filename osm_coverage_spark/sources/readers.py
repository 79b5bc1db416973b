"""Source readers for the extraction stage (SURVEY §2.1).

- semicolon-CSV house-coordinate files, all columns as strings
  (reference ``pd.read_csv(sep=';', dtype=str)``,
  scripts/02_extract_alkis.py:505,859) → native Spark CSV reader;
- INSPIRE-GML-shaped XML: two entity kinds (street names, addresses) in one
  pass with street-ref resolution (02:660-779) → ``binaryFile`` scan +
  ElementTree parse inside ``mapInPandas`` (Arrow batches of whole files,
  one task per file — the distributed analog of the reference's single
  iterparse loop), then a broadcast join resolves street refs;
- GPKG layers are out of scope at scale (pre-convert to parquet per SURVEY
  §2.1); ``read_geoparquet_points`` covers the converted form.

All readers return the canonical point-record schema
(street, housenumber, postcode, city, lon, lat).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_house_coordinates_csv(spark: SparkSession, path: str) -> DataFrame:
    """';'-separated, header row, every column StringType (dtype=str
    contract); required-field and hnr!='0' filters applied as in
    02:507-510,868-871."""
    df = (
        spark.read.option("sep", ";")
        .option("header", "true")
        .option("inferSchema", "false")
        .csv(path)
    )
    df = df.na.drop(subset=["str", "hnr", "ostwert", "nordwert"])
    df = df.filter(F.col("hnr") != "0")
    return df.select(
        F.col("str").alias("street"),
        F.concat(F.col("hnr"), F.coalesce(F.col("adz"), F.lit(""))).alias(
            "housenumber"
        ),
        F.col("plz").alias("postcode"),
        F.col("ort").alias("city"),
        F.col("ostwert").cast("double").alias("lon"),
        F.col("nordwert").cast("double").alias("lat"),
    )


_GML_STREET_TAG = "ThoroughfareName"
_GML_ADDR_TAG = "Address"


def parse_gml_entities(xml_text: str) -> tuple[list[dict], list[dict]]:
    """One pass over a GML-shaped document: collect street-name entities and
    address entities (street referenced by id, with the reference's
    '#'-prefix fallback, 02:749-779)."""
    streets, addrs = [], []
    root = ET.fromstring(xml_text)
    for el in root.iter():
        tag = el.tag.split("}")[-1]
        if tag == _GML_STREET_TAG:
            streets.append(
                {"street_id": el.get("id", ""), "street": (el.findtext("name") or "").strip()}
            )
        elif tag == _GML_ADDR_TAG:
            ref = el.get("street_ref", "") or ""
            addrs.append(
                {
                    "street_ref": ref.lstrip("#"),
                    "housenumber": el.findtext("number") or "",
                    "postcode": el.findtext("postcode"),
                    "city": el.findtext("city"),
                    "lon": float(el.findtext("lon") or "nan"),
                    "lat": float(el.findtext("lat") or "nan"),
                }
            )
    return streets, addrs


def read_gml_addresses(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → per-file XML parse in mapInPandas → broadcast join
    of the street side-table onto the address stream."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse_streets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                s, _ = parse_gml_entities(bytes(content).decode("utf-8"))
                rows.extend(s)
            yield pd.DataFrame(rows, columns=["street_id", "street"])

    def parse_addrs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _, a = parse_gml_entities(bytes(content).decode("utf-8"))
                rows.extend(a)
            yield pd.DataFrame(
                rows,
                columns=["street_ref", "housenumber", "postcode", "city", "lon", "lat"],
            )

    streets = files.mapInPandas(parse_streets, "street_id string, street string")
    addrs = files.mapInPandas(
        parse_addrs,
        "street_ref string, housenumber string, postcode string, city string, "
        "lon double, lat double",
    )
    joined = addrs.join(
        F.broadcast(streets), addrs["street_ref"] == streets["street_id"], "left"
    )
    return joined.select(
        "street", "housenumber", "postcode", "city", "lon", "lat"
    ).filter(F.col("street").isNotNull() & (F.trim("street") != ""))


def read_geoparquet_points(spark: SparkSession, path: str) -> DataFrame:
    """Converted GeoParquet: lon/lat columns pass through; otherwise a WKB
    point column is decoded in a vectorized Arrow batch (numpy frombuffer —
    little-endian WKB Point: 1-byte order + 4-byte type + 2 doubles)."""
    df = spark.read.parquet(path)
    if "lon" in df.columns and "lat" in df.columns:
        return df
    if "geometry" not in df.columns:
        raise ValueError("need lon/lat or a WKB geometry column")

    import numpy as np

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blob = b"".join(bytes(g)[5:21] for g in pdf["geometry"])
            arr = np.frombuffer(blob, dtype="<f8").reshape(-1, 2)
            out = pdf.copy()
            out["lon"] = arr[:, 0]
            out["lat"] = arr[:, 1]
            yield out

    return df.mapInPandas(decode, f"{out_fields}, lon double, lat double")


_BAD_CHARS = re.compile(r"[<>&]")


def make_gml_fixture(path: str, n_streets: int = 20, n_addrs: int = 200) -> None:
    """Deterministic GML-shaped fixture file for tests."""
    parts = ["<root>"]
    for i in range(n_streets):
        parts.append(
            f'<ThoroughfareName id="s{i}"><name>Teststraße {i}</name></ThoroughfareName>'
        )
    for j in range(n_addrs):
        ref = f"s{j % n_streets}"
        prefix = "#" if j % 3 == 0 else ""  # exercise the '#' fallback
        parts.append(
            f'<Address street_ref="{prefix}{ref}">'
            f"<number>{j % 60 + 1}</number><postcode>5{j % 9000 + 1000}</postcode>"
            f"<city>Ort{j % 7}</city><lon>{6 + (j % 100) / 50}</lon>"
            f"<lat>{50 + (j % 100) / 100}</lat></Address>"
        )
    parts.append("</root>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
