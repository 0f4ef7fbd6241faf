"""Deterministic hotels fixture mirroring the reference corpus shape
(combined.csv: 40 rows, 20 per city, header
`name,addr_text,city,lat,lon,price_usd,rating,url`; lat/lon all 0 —
combined.csv:2). Used by the ingest-pipeline and golden flagship tests
(FIXTURES.md §11)."""

from __future__ import annotations

import csv
import io

CITIES = ["Goa", "Manali"]
_STREETS = ["Beach Road", "Hilltop Lane", "Market Street", "Riverside Walk",
            "Palm Avenue", "Cedar Trail", "Sunset Boulevard", "Old Fort Road",
            "Valley View", "Station Road"]
_KINDS = ["Resort", "Inn", "Lodge", "Retreat", "Suites"]


def hotels_rows(per_city: int = 20) -> list[dict]:
    rows = []
    for city in CITIES:
        for i in range(per_city):
            kind = _KINDS[i % len(_KINDS)]
            street = _STREETS[i % len(_STREETS)]
            name = f"{city} {kind} {i + 1:02d}"
            rows.append({
                "name": name,
                "addr_text": f"{i + 1} {street} near {city} center {kind.lower()} quarter",
                "city": city,
                "lat": 0.0,
                "lon": 0.0,
                "price_usd": round(45.0 + 7.5 * i, 2),
                "rating": round(3.0 + (i % 5) * 0.5, 1),
                "url": f"https://example.com/{city.lower()}-{kind.lower()}-{i + 1}",
            })
    return rows


def write_hotels_csv(path: str, per_city: int = 20) -> str:
    rows = hotels_rows(per_city)
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
    with open(path, "w") as f:
        f.write(buf.getvalue())
    return path
