"""Deterministic trajectory/sample synthesis (MatcherSample analog).

Generates GPS-like traces by walking routes on a road map and emitting
1 Hz points with seeded Gaussian noise (sigma defaults to the matcher's
10 m, matcher/Matcher.java:62), per FIXTURES.md §3. Also parses the
reference's JSON sample wire format
({"id","time","point":"POINT(lon lat)"[,"azimuth"]},
matcher/MatcherSample.java:91-102).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import geo
from ..index import RoadIndex

SAMPLE_COLUMNS = ["trace_id", "sample_id", "time", "lat", "lon", "azimuth"]


def synth_traces(idx: RoadIndex, n_traces: int, samples_per_trace: int = 60,
                 seed: int = 42, speed_mps: float = 12.0,
                 noise_m: float = 10.0, t0_ms: int = 0) -> pd.DataFrame:
    """Walk random successor chains; emit 1 Hz noisy samples."""
    rng = np.random.default_rng(seed)
    rows = []
    n_edges = len(idx.edge_id)
    for t in range(n_traces):
        tid = f"trace-{t:06d}"
        e = int(rng.integers(0, n_edges))
        frac = float(rng.uniform(0, 0.5))
        pos_m = frac * idx.edge_len[e]
        t_ms = t0_ms + int(rng.integers(0, 1000)) * 1000
        for s in range(samples_per_trace):
            f = min(1.0, pos_m / idx.edge_len[e]) if idx.edge_len[e] > 0 else 1.0
            lat, lon, azi = idx.edge_point(np.array([e]), np.array([f]))
            # geodesic noise: random bearing + |N(0, noise)| distance
            bearing = float(rng.uniform(0, 360))
            off = abs(float(rng.normal(0, noise_m)))
            nlat, nlon, _ = geo.direct(lat[0], lon[0], bearing, off)
            rows.append((tid, f"{tid}-{s:04d}", t_ms, float(nlat), float(nlon),
                         float(azi[0])))
            t_ms += 1000
            pos_m += speed_mps
            while pos_m >= idx.edge_len[e]:
                s0, s1 = idx.succ_offsets[e], idx.succ_offsets[e + 1]
                succs = idx.successors[s0:s1]
                # avoid immediate U-turns when an alternative exists
                if len(succs) > 1:
                    base = idx.edge_base[e]
                    non_u = succs[idx.edge_base[succs] != base]
                    succs = non_u if len(non_u) else succs
                if not len(succs):
                    pos_m = idx.edge_len[e]
                    break
                pos_m -= idx.edge_len[e]
                e = int(succs[rng.integers(0, len(succs))])
    return pd.DataFrame(rows, columns=SAMPLE_COLUMNS)


def parse_sample_json(df_json: pd.Series) -> pd.DataFrame:
    """Batch-parse the reference's JSON sample wire format
    ({"id","time","point":"POINT(lon lat)"[,"azimuth"]}) into columns.
    `time` is epoch-millis or a "yyyy-MM-dd HH:mm:ssX" string
    (markov/Sample.java:43-58)."""
    import json

    from .. import wkbio

    recs = []
    for s in df_json:
        o = json.loads(s)
        lon, lat = wkbio.parse_wkt_point(o["point"])
        t = o["time"]
        if isinstance(t, str):
            t = int(pd.Timestamp(t).timestamp() * 1000)
        recs.append((str(o["id"]), int(t), lat, lon,
                     normalize_azimuth(float(o.get("azimuth", np.nan)))))
    return pd.DataFrame(recs, columns=["trace_id", "time", "lat", "lon", "azimuth"])


def normalize_azimuth(azi):
    """Wrap heading to [0, 360) with positive modulo
    (MatcherSample.java:104-107); NaN passes through (no heading)."""
    return np.mod(np.mod(azi, 360.0) + 360.0, 360.0)
