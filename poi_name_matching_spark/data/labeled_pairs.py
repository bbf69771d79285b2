"""Labeled-pair fixture mirroring the reference's central relation.

Reference shape (``load_data/label_data.py:50``, ``load_data/baseline.py:104``):

    (osm_name, yelp_name, osm_latitude, osm_longitude,
     yelp_latitude, yelp_longitude, distance, match)

Here generalized to (left_name, right_name, …) per FIXTURES.md §2, with the
reference's label distribution: ~83% label 0 (no match), ~15% label 1
(match, ~60% of them exact-name — 504/846 in the reference), ~2% labels
2/3 (unclear / not-a-POI) which every evaluation path must drop first
(``load_data/baseline.py:124-125``).
"""

from __future__ import annotations

import random

from ..functions.kernels import haversine_meters
from .transcripts import NOISE_KINDS, _apply_noise, _entity_phrase

LABELED_PAIRS_SCHEMA = (
    "left_name string, right_name string, left_lat double, left_lon double, "
    "right_lat double, right_lon double, distance double, match int"
)

# one city-scale box (≈ Vancouver, the reference's main study area)
_LAT0, _LON0 = 49.20, -123.20
_SPAN = 0.15


def generate_labeled_pairs(n_pairs: int = 2000, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows: list[tuple] = []
    for _ in range(n_pairs):
        u = rng.random()
        lat1 = _LAT0 + rng.random() * _SPAN
        lon1 = _LON0 + rng.random() * _SPAN
        left = _entity_phrase(rng)
        if u < 0.83:  # non-match: a different entity nearby
            match = 0
            # word-disjoint negative, like the reference's nearby-POI
            # negatives (distinct businesses rarely share name words)
            left_words = set(left.split())
            right = _entity_phrase(rng)
            while left_words & set(right.split()):
                right = _entity_phrase(rng)
        elif u < 0.98:  # match
            match = 1
            kind = "exact" if rng.random() < 0.6 else rng.choice(NOISE_KINDS[1:])
            right = _apply_noise(rng, [left], kind)[0]
        else:  # unclear / not-a-POI — must be dropped by pipelines under test
            match = rng.choice([2, 3])
            right = _entity_phrase(rng)
        # candidate pairs come from the ±0.0002° box blocking
        # (label_data.py:62), so offsets stay inside that band
        lat2 = lat1 + (rng.random() - 0.5) * 0.0004
        lon2 = lon1 + (rng.random() - 0.5) * 0.0004
        dist = haversine_meters(lat1, lon1, lat2, lon2)
        rows.append((left, right, lat1, lon1, lat2, lon2, dist, match))
    return rows


def labeled_pairs_df(spark, n_pairs: int = 2000, seed: int = 42):
    return spark.createDataFrame(
        generate_labeled_pairs(n_pairs, seed), LABELED_PAIRS_SCHEMA
    )
