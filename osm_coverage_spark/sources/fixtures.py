"""Seeded synthetic fixtures per FIXTURES.md (F1 alkis / F2 osm / F3
corrections) with every edge case SURVEY §2 names, plus a pure-Python golden
implementation of the reference's compare semantics (clean-room, from the
studied behavior of scripts/04_compare_optimized.py — including its quirks)
used as the end-to-end oracle in tests/test_golden_reference.py.
"""

from __future__ import annotations

import math
import random
import re

from ..functions.normalize import alkis_id_py, normalize_key_py

EDGE_STREETS = [
    "Bgm.-Müller-Str.",
    "Dr. Karl-Weg",
    "St. Anna-Pl.",
    "Prof.-Geschw.-Scholl-Allee",
    "Gerhard-Hauptmann-Weg",
    "Bauerschaft Nordfeld (alt)",
    "Große Straße",
    "Hauptstraße",
    "Am Markt",
    "Lindenallee",
]
OSM_STREETS = [
    "Bürgermeister-Müller-Straße",
    "Doktor Karl-Weg",
    "Sankt Anna-Platz",
    "Professor-Geschwister-Scholl-Allee",
    "Gerhart-Hauptmann-Weg",
    "Nordfeld",
    "Grosse Strasse",
    "Hauptstrasse",
    "Am Markt",
    "Lindenallee",
]
EDGE_HNRS = ["7-13", "8-11", "A-3", "12a", "5/7", "1, 3", "9 b", "13-7", "4", "27"]


def make_alkis(n: int = 300, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        si = i % len(EDGE_STREETS)
        street = EDGE_STREETS[si]
        hnr = EDGE_HNRS[i % 9]  # period 9 vs streets' 10: decorrelated pairs
        district = f"D{i % 6}"
        city = "Aachen" if i % 7 == 0 else f"C{i % 4}"
        lon = round(6.0 + rng.randrange(0, 8000) / 2000.0, 4)
        lat = round(50.0 + rng.randrange(0, 4000) / 2000.0, 4)
        rows.append(
            {
                "alkis_id": alkis_id_py(district, street, hnr, lon, lat),
                "street": street,
                "housenumber": hnr,
                "city": city,
                "district": district,
                "state": "nrw" if i % 2 == 0 else "nds",
                "lon": lon,
                "lat": lat,
            }
        )
    rows.append(dict(rows[0]))  # exact duplicate row (dedup/multiplicity path)
    return rows


def make_osm(alkis: list[dict], seed: int = 43) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i, a in enumerate(alkis):
        mode = i % 10
        street = OSM_STREETS[EDGE_STREETS.index(a["street"])]
        if mode <= 5:  # nearby match (~40 m east)
            rows.append(
                {
                    "street": street,
                    "housenumber": a["housenumber"],
                    "housename": None,
                    "city": a["city"],
                    "lon": a["lon"] + 0.0005,
                    "lat": a["lat"],
                }
            )
        elif mode == 6 and a["housenumber"].endswith("a"):
            rows.append(  # housename-variant-only match
                {
                    "street": street,
                    "housenumber": a["housenumber"][:-1],
                    "housename": "a",
                    "city": a["city"],
                    "lon": a["lon"] + 0.0005,
                    "lat": a["lat"],
                }
            )
        elif mode == 7:  # same key, too far (~3.5 km)
            rows.append(
                {
                    "street": street,
                    "housenumber": a["housenumber"],
                    "housename": None,
                    "city": a["city"],
                    "lon": a["lon"] + 0.05,
                    "lat": a["lat"],
                }
            )
        # modes 8, 9: absent from OSM
    rng.shuffle(rows)
    return rows


CORRECTIONS = [
    {"from_street": "Lindenallee", "city": "D3", "to_street": "Linden-Allee",
     "tag": "renamed", "comment": "c1"},
    {"replace_in_street": "Am Markt", "replace_with": "Marktplatz"},
    {"from_street": "Hauptstraße", "from_housenumber": "4", "ignore": True},
]


# ---------------------------------------------------------------------------
# Pure-Python golden of the compare pipeline (reference semantics incl.
# quirks: sequential corrections, Aachen explode only for city=='Aachen',
# parity-step ranges with inverted-range drop, housename variants, planar
# <150 m match in projected meters ≈ haversine at fixture distances,
# district-missing excludes 'ignored' while global does not).
# ---------------------------------------------------------------------------

RANGE_RE = re.compile(r"^(\d+)\s*-\s*(\d+)$")


def _haversine_m(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


def _apply_corrections_py(rows: list[dict], corrections: list[dict]) -> None:
    for r in rows:
        r.setdefault("correction_type", None)
        r.setdefault("original_street", None)
        r.setdefault("original_housenumber", None)
    for corr in corrections:
        tag = corr.get("tag", "corrected")
        for r in rows:
            if "alkis_id" in corr:
                hit = r["alkis_id"] == corr["alkis_id"]
            elif corr.get("from_street"):
                hit = r["street"] == corr["from_street"]
                if "city" in corr:
                    hit = hit and r["district"] == corr["city"]
                if "from_housenumber" in corr:
                    hit = hit and r["housenumber"] == corr["from_housenumber"]
            elif corr.get("replace_in_street"):
                hit = corr["replace_in_street"] in (r["street"] or "")
                if "city" in corr:
                    hit = hit and r["district"] == corr["city"]
            else:
                hit = False
            if not hit:
                continue
            if r["original_street"] is None:
                r["original_street"] = r["street"]
            if "replace_in_street" not in corr and r["original_housenumber"] is None:
                r["original_housenumber"] = r["housenumber"]
            if corr.get("ignore"):
                r["correction_type"] = "ignored"
            elif corr.get("replace_in_street"):
                r["street"] = r["street"].replace(
                    corr["replace_in_street"], corr.get("replace_with", "")
                )
                r["correction_type"] = tag
            else:
                if "to_street" in corr:
                    r["street"] = corr["to_street"]
                    r["correction_type"] = tag
                if "to_housenumber" in corr:
                    r["housenumber"] = corr["to_housenumber"]
                    r["correction_type"] = tag


def _expand_py(rows: list[dict], aachen: bool) -> list[dict]:
    out = []
    for r in rows:
        parts = [r["housenumber"]]
        if (
            aachen
            and r.get("city") == "Aachen"
            and r["housenumber"] is not None
            and re.search(r"[/,;]", str(r["housenumber"]))
        ):
            parts = [
                p.strip()
                for p in re.sub(r"[/;]", ",", str(r["housenumber"])).split(",")
                if p.strip()
            ]
        expanded = []
        for p in parts:
            s = str(p)
            if "-" in s:
                m = RANGE_RE.match(s.strip())
                if m:
                    a, b = int(m.group(1)), int(m.group(2))
                    step = 2 if a % 2 == b % 2 else 1
                    expanded.extend(str(x) for x in range(a, b + 1, step))
                else:
                    expanded.append(s)
            else:
                expanded.append(p)
        for hnr in expanded:
            nr = dict(r)
            nr["housenumber"] = hnr
            out.append(nr)
    return out


def golden_compare(alkis: list[dict], osm: list[dict],
                   corrections: list[dict] | None = None) -> dict:
    """→ {"missing": [(alkis_id, housenumber, ...)], "district_stats": {...}}"""
    alkis = [dict(r) for r in alkis]
    _apply_corrections_py(alkis, corrections or [])
    alkis = _expand_py(alkis, aachen=True)
    osm = _expand_py([dict(r) for r in osm], aachen=True)

    osm_exp = list(osm)
    for r in osm:
        if r.get("housename"):
            nr = dict(r)
            nr["housenumber"] = f"{r['housenumber'] or ''}, {r['housename']}"
            osm_exp.append(nr)

    by_key: dict[str, list[dict]] = {}
    for r in osm_exp:
        by_key.setdefault(
            normalize_key_py(r["street"] or "", r["housenumber"] or ""), []
        ).append(r)

    for r in alkis:
        key = normalize_key_py(r["street"] or "", r["housenumber"] or "")
        r["found_in_osm"] = any(
            _haversine_m(r["lat"], r["lon"], o["lat"], o["lon"]) < 150.0
            for o in by_key.get(key, [])
        )

    missing = sorted(
        (r["alkis_id"], r["housenumber"], r["district"], r["state"])
        for r in alkis
        if not r["found_in_osm"] and r.get("correction_type") != "ignored"
    )
    stats: dict[tuple, dict] = {}
    for r in alkis:
        k = (r["state"], r["district"])
        s = stats.setdefault(k, {"total": 0, "missing": 0, "corrections": 0})
        s["total"] += 1
        if not r["found_in_osm"] and r.get("correction_type") != "ignored":
            s["missing"] += 1
        if (r.get("correction_type") is not None and r["found_in_osm"]) or r.get(
            "correction_type"
        ) == "ignored":
            s["corrections"] += 1
    return {"missing": missing, "district_stats": stats}
