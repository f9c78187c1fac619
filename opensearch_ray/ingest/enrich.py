"""Stateful enrichment processors: user_agent and geoip.

Ref: modules/ingest-user-agent (regex corpus over the UA string) and
plugins/ingest-geoip (MaxMind DB lookup). Both are the actor-pool shape —
state loads once per worker in ``__init__``, lookups run per batch.

- ``UserAgentProcessor``: a small built-in, deterministic ruleset covering the
  common browser/OS families (the full uap-core regexes aren't shippable
  here; the rule order mirrors uap-core's first-match-wins semantics).
- ``GeoIpProcessor``: gated behind an import-try for ``maxminddb``; without
  the library (this container) it uses a clearly-marked deterministic STUB
  that hashes the IP into a fake city table — the Ray plumbing (actor state,
  per-batch lookup, output columns) is real and tested.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np
import pandas as pd

from ray.data import Dataset

_UA_RULES = [
    # (family, browser regex with version group)
    ("Edge", re.compile(r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)")),
    ("Opera", re.compile(r"OPR/(\d+[\.\d]*)")),
    ("Chrome", re.compile(r"Chrome/(\d+[\.\d]*)")),
    ("Firefox", re.compile(r"Firefox/(\d+[\.\d]*)")),
    ("Safari", re.compile(r"Version/(\d+[\.\d]*).*Safari/")),
    ("IE", re.compile(r"MSIE (\d+[\.\d]*)")),
]
_OS_RULES = [
    ("Windows", re.compile(r"Windows NT (\d+[\.\d]*)")),
    ("Android", re.compile(r"Android (\d+[\.\d]*)")),
    ("iOS", re.compile(r"(?:iPhone|iPad).*OS (\d+[_\d]*)")),
    ("Mac OS X", re.compile(r"Mac OS X (\d+[_\.\d]*)")),
    ("Linux", re.compile(r"Linux")),
]


class UserAgentProcessor:
    """Enrichment stage. Two usage modes:

    - task-based (PREFERRED when state is cheap, as here — the rulesets are
      module-level):  ds.map_batches(lambda df: UserAgentProcessor()(df),
      batch_format="pandas")
    - actor pool (for genuinely expensive state):
      ds.map_batches(UserAgentProcessor, concurrency=N, ...). Size the SUM of
      all pools' CPUs below the session's CPU count — chained pools that
      together reserve every CPU starve the upstream read and deadlock
      (observed on a 4-cpu session with two concurrency=2 pools).
    """

    def __init__(self, field: str = "user_agent", target_prefix: str = "ua_"):
        self.field = field
        self.prefix = target_prefix
        self.ua_rules = _UA_RULES     # compiled at module import; held per actor
        self.os_rules = _OS_RULES

    def parse_one(self, ua: str):
        name, ver = "Other", None
        for fam, rx in self.ua_rules:
            m = rx.search(ua or "")
            if m:
                name, ver = fam, m.group(1)
                break
        os_name = "Other"
        for fam, rx in self.os_rules:
            if rx.search(ua or ""):
                os_name = fam
                break
        device = ("Mobile" if re.search(r"Mobi|Android|iPhone", ua or "")
                  else "Other")
        return name, ver, os_name, device

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        parsed = [self.parse_one(u) for u in df[self.field]]
        df[self.prefix + "name"] = [p[0] for p in parsed]
        df[self.prefix + "version"] = [p[1] for p in parsed]
        df[self.prefix + "os"] = [p[2] for p in parsed]
        df[self.prefix + "device"] = [p[3] for p in parsed]
        return df


_FAKE_CITIES = [
    ("US", "San Francisco", 37.77, -122.42),
    ("DE", "Berlin", 52.52, 13.40),
    ("JP", "Tokyo", 35.68, 139.69),
    ("BR", "São Paulo", -23.55, -46.63),
    ("IN", "Mumbai", 19.08, 72.88),
    ("AU", "Sydney", -33.87, 151.21),
    ("GB", "London", 51.51, -0.13),
    ("FR", "Paris", 48.86, 2.35),
]


class GeoIpProcessor:
    """Actor-pool stage: MaxMind lookup when ``maxminddb`` + a db path are
    available, else a deterministic STUB (hash(ip) -> fake city table).
    The stub is clearly marked via the ``geo_stub`` output column."""

    def __init__(self, field: str = "ip", target_prefix: str = "geo_",
                 db_path: Optional[str] = None, ranges=None):
        """``ranges``: a user-supplied CIDR table — iterable of
        (cidr, country, city, lat, lon) — the GeoLite2-CSV distribution
        shape. This is the REAL lookup path in this container (the .mmdb
        DATA can't ship, but the algorithm is a sorted-range binary
        search, identical to what the mmdb trie answers): rows sort by
        network start, a vectorized searchsorted finds the covering
        range per ip. Built once per ACTOR (__init__), used per batch."""
        self.field = field
        self.prefix = target_prefix
        self.reader = None
        self.ranges = None
        if ranges is not None:
            from ..mapper import cidr_bounds
            rows = sorted(
                (( *cidr_bounds(r[0]), r[1], r[2], float(r[3]),
                   float(r[4])) for r in ranges), key=lambda x: x[0])
            self._lo = np.asarray([r[0] for r in rows], np.uint32)
            self._hi = np.asarray([r[1] for r in rows], np.uint32)
            self._meta = [(r[2], r[3], r[4], r[5]) for r in rows]
            self.ranges = rows
        if db_path is not None:
            try:  # pragma: no cover - library absent in this container
                import maxminddb
                self.reader = maxminddb.open_database(db_path)
            except ImportError:
                self.reader = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ips = df[self.field].astype(str)
        if self.ranges is not None:
            from ..mapper import ipv4_to_uint32
            import pyarrow as pa
            v = ipv4_to_uint32(pa.chunked_array([pa.array(ips.tolist())]))
            pos = np.searchsorted(self._lo, v, side="right") - 1
            pc = np.clip(pos, 0, len(self._lo) - 1)
            hit = (pos >= 0) & (v <= self._hi[pc])
            meta = [self._meta[p] if h else (None, None, None, None)
                    for p, h in zip(pc.tolist(), hit.tolist())]
            df[self.prefix + "country"] = [m[0] for m in meta]
            df[self.prefix + "city"] = [m[1] for m in meta]
            df[self.prefix + "lat"] = [m[2] for m in meta]
            df[self.prefix + "lon"] = [m[3] for m in meta]
            df[self.prefix + "stub"] = False
            return df
        if self.reader is not None:  # pragma: no cover
            recs = [self.reader.get(ip) or {} for ip in ips]
            df[self.prefix + "country"] = [
                (r.get("country") or {}).get("iso_code") for r in recs]
            df[self.prefix + "city"] = [
                ((r.get("city") or {}).get("names") or {}).get("en") for r in recs]
            df[self.prefix + "stub"] = False
            return df
        h = pd.util.hash_array(np.asarray(ips, dtype=object))
        idx = (h % np.uint64(len(_FAKE_CITIES))).astype(int)
        df[self.prefix + "country"] = [_FAKE_CITIES[i][0] for i in idx]
        df[self.prefix + "city"] = [_FAKE_CITIES[i][1] for i in idx]
        df[self.prefix + "lat"] = [_FAKE_CITIES[i][2] for i in idx]
        df[self.prefix + "lon"] = [_FAKE_CITIES[i][3] for i in idx]
        df[self.prefix + "stub"] = True  # deterministic fake, NOT real geo
        return df
