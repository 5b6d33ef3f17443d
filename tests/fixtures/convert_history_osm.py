"""One-off converter: reference .osm XML test data -> osm_history.json.

Re-encodes the PUBLIC test *data* bundled by the reference
(oshdb-util/src/test/resources/{different-timestamps,incomplete-osm}/*.osm)
into the JSON shape tests/osmhistory_harness.py loads — the same
data-re-encoding approach as fixtures/osm_testdata.json.  Run from a
checkout that has the reference available:

    python tests/fixtures/convert_history_osm.py /path/to/oshdb
"""

from __future__ import annotations

import json
import os
import sys
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

FILES = {
    "history_node": "different-timestamps/node.osm",
    "history_way": "different-timestamps/way.osm",
    "history_polygon": "different-timestamps/polygon.osm",
    "history_not_mp": "different-timestamps/type-not-multipolygon.osm",
    "incomplete_way": "incomplete-osm/way.osm",
    "incomplete_polygon": "incomplete-osm/polygon.osm",
}


def _ts(s: str) -> int:
    return int(
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def convert(path: str) -> dict:
    root = ET.parse(path).getroot()
    out = {"nodes": [], "ways": [], "relations": []}
    for el in root:
        if el.tag not in ("node", "way", "relation"):
            continue
        e = {
            "id": int(el.get("id")),
            "version": int(el.get("version")),
            "visible": el.get("visible", "true") == "true",
            "ts": _ts(el.get("timestamp")),
            "changeset": int(el.get("changeset", "0")),
            "uid": int(el.get("uid", "0")),
            "tags": {t.get("k"): t.get("v") for t in el.findall("tag")},
        }
        if el.tag == "node":
            e["lon"] = float(el.get("lon")) if el.get("lon") else None
            e["lat"] = float(el.get("lat")) if el.get("lat") else None
            out["nodes"].append(e)
        elif el.tag == "way":
            e["refs"] = [int(nd.get("ref")) for nd in el.findall("nd")]
            out["ways"].append(e)
        else:
            e["members"] = [
                {
                    "type": m.get("type"),
                    "ref": int(m.get("ref")),
                    "role": m.get("role", ""),
                }
                for m in el.findall("member")
            ]
            out["relations"].append(e)
    return out


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    base = os.path.join(ref, "oshdb-util/src/test/resources")
    data = {name: convert(os.path.join(base, rel)) for name, rel in FILES.items()}
    dest = os.path.join(os.path.dirname(__file__), "osm_history.json")
    with open(dest, "w") as f:
        json.dump(data, f, separators=(",", ":"))
    sizes = {k: {t: len(v[t]) for t in v} for k, v in data.items()}
    print(json.dumps(sizes, indent=1))


if __name__ == "__main__":
    main()
