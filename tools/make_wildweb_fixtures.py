#!/usr/bin/env python3
"""Author the wildweb golden fixtures (FIXTURES.md §1.5).

Writes fixtures/wildweb/run_ok/*.json, run_abort/*.json and the golden
expected_featurecollection.json. The golden is computed HERE, straight from
the reference semantics (task.ts:109-140) independently of the Spark code:
time-range filter (date >= now - range), minute-truncated UTC date
normalization applied before the metadata embed, JS-faithful geo-validity
(falsy / NaN / zero → drop), unconditional longitude negation.

Fixture invariants the oracle SQL relies on: all dates are '...Z' ISO with
seconds present; resources elements are plain strings.
"""
import json, math, os
from datetime import datetime, timezone

NOW = datetime(2026, 1, 15, 12, 0, 0, tzinfo=timezone.utc)
RANGE_HOURS = 168  # "1 Week"

BASE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "wildweb")

def inc(uuid, date, name, lat, lon, *, ic="J. Doe", acres="12.5", fuels="Timber",
        inc_num="INC-1", fire_num="FN-1", location="Ridge Rd", resources=None,
        webComment="initial attack", fire_status="Active", typ="Wildfire",
        fiscal="FS-2026"):
    return {
        "ic": ic, "date": date, "name": name, "type": typ, "uuid": uuid,
        "acres": acres, "fuels": fuels, "inc_num": inc_num, "fire_num": fire_num,
        "latitude": lat, "location": location, "longitude": lon,
        "resources": resources or [], "webComment": webComment,
        "fire_status": fire_status, "fiscal_data": fiscal,
    }

CENTER_OK = [inc(*args, **kw) for args, kw in [
    (("w001", "2026-01-15T11:23:45Z", "CANYON FIRE", "34.0522", "118.2437"), {}),
    (("w002", "2026-01-15T00:10:30Z", "MESA FIRE", "40.7128", "74.0060"), {}),
    (("w003", "2026-01-14T00:05:59Z", "PINE FIRE", "36.17", "115.14"), {}),
    (("w004", "2026-01-13T00:00:01Z", "OAK FIRE", "33.45", "112.07"), {}),
    (("w005", "2026-01-10T12:00:00Z", "SAGE FIRE", "39.74", "104.99"), {}),
    # exactly now - 168h: kept (strictly-older dropped, task.ts:113)
    (("w006", "2026-01-08T12:00:00Z", "BOUNDARY FIRE", "47.61", "122.33"), {}),
    (("w007", "2026-01-08T13:30:15Z", "RIM FIRE", "45.52", "122.68"), {}),
    # 10 days ago: dropped by every IncidentRange
    (("w008", "2026-01-05T09:00:00Z", "OLD FIRE", "37.77", "122.42"), {}),
    # null optionals + negative source longitude (flips positive, task.ts:138)
    (("w009", "2026-01-15T10:00:00Z", "GHOST FIRE", "31.0", "-120.5"),
     dict(ic=None, acres=None, fuels=None, inc_num=None, fire_num=None,
          location=None, webComment=None)),
    (("w010", "2026-01-15T09:05:06Z", "CREW FIRE", "32.22", "110.97"),
     dict(resources=["Engine 31", "Crew 7", "Helicopter 3"])),
]]

CENTER_BAD_COORDS = [inc(*args, **kw) for args, kw in [
    (("x001", "2026-01-15T11:00:00Z", "NULL LON", "34.1", None), {}),
    (("x002", "2026-01-15T11:00:00Z", "EMPTY LON", "34.2", ""), {}),
    (("x003", "2026-01-15T11:00:00Z", "ZERO LON", "34.3", "0"), {}),
    (("x004", "2026-01-15T11:00:00Z", "ALPHA LON", "34.4", "abc"), {}),
    (("x005", "2026-01-15T11:00:00Z", "BLANK LON", "34.5", " "), {}),
    (("x006", "2026-01-15T11:00:00Z", "GOOD WEST", "39.7", "105.1"), {}),
    (("x007", "2026-01-15T11:00:00Z", "GOOD EAST", "35.5", "-106.25"), {}),
    (("x008", "2026-01-15T11:00:00Z", "ZERO LAT", "0", "111.1"), {}),
    (("x009", "2026-01-15T11:00:00Z", "ALPHA LAT", "abc", "111.2"), {}),
]]

def envelope(data):
    return [{"retrieved": "2026-01-15T12:00:00Z", "data": data}]

def js_number(s):
    """JS Number(x) for our string-or-null fixture values."""
    if s is None:
        return math.nan  # Number(null) is 0, but null fails the falsy check first
    t = s.strip()
    if t == "":
        return 0.0  # Number('')/Number(' ') === 0
    try:
        return float(t)
    except ValueError:
        return math.nan

def keep_geo(v):  # task.ts:120-124: falsy || NaN || zero → drop
    if not v:  # null / '' falsy
        return False
    n = js_number(v)
    return not math.isnan(n) and n != 0.0

def normalize_date(d):  # task.ts:118
    dt = datetime.strptime(d, "%Y-%m-%dT%H:%M:%SZ")
    return dt.strftime("%Y-%m-%d %H:%M")

def feature(fire):
    meta = dict(fire)
    meta["date"] = normalize_date(fire["date"])
    return {
        "id": "wildweb-" + fire["uuid"],
        "type": "Feature",
        "properties": {"callsign": fire["name"], "start": meta["date"],
                       "metadata": meta},
        "geometry": {"type": "Point",
                     "coordinates": [js_number(fire["longitude"]) * -1,
                                     js_number(fire["latitude"])]},
    }

def main():
    ok_dir = os.path.join(BASE, "run_ok")
    abort_dir = os.path.join(BASE, "run_abort")
    os.makedirs(ok_dir, exist_ok=True)
    os.makedirs(abort_dir, exist_ok=True)
    with open(os.path.join(ok_dir, "center_ok.json"), "w") as f:
        json.dump(envelope(CENTER_OK), f, indent=2)
    with open(os.path.join(ok_dir, "center_null_data.json"), "w") as f:
        json.dump(envelope(None), f, indent=2)
    with open(os.path.join(ok_dir, "center_bad_coords.json"), "w") as f:
        json.dump(envelope(CENTER_BAD_COORDS), f, indent=2)
    # run_abort: one well-formed center + one 2-element envelope → A4 abort
    with open(os.path.join(abort_dir, "center_ok.json"), "w") as f:
        json.dump(envelope(CENTER_OK), f, indent=2)
    two = [{"retrieved": "2026-01-15T12:00:00Z", "data": CENTER_BAD_COORDS[:1]},
           {"retrieved": "2026-01-15T12:05:00Z", "data": None}]
    with open(os.path.join(abort_dir, "center_multi_envelope.json"), "w") as f:
        json.dump(two, f, indent=2)

    cutoff = NOW.timestamp() - RANGE_HOURS * 3600
    feats = []
    for fire in CENTER_OK + CENTER_BAD_COORDS:
        dt = datetime.strptime(fire["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc)
        if dt.timestamp() < cutoff:
            continue  # A7
        if not (keep_geo(fire["longitude"]) and keep_geo(fire["latitude"])):
            continue  # A9
        feats.append(feature(fire))
    feats.sort(key=lambda f: f["id"])
    fc = {"type": "FeatureCollection", "features": feats}
    with open(os.path.join(BASE, "expected_featurecollection.json"), "w") as f:
        json.dump(fc, f, indent=2)
    print(f"wrote {len(feats)} expected features")

if __name__ == "__main__":
    main()
