"""Deterministic synthetic transcripts with planted duplicate clusters.

Schema per BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Planted truth (FIXTURES.md §1): ~30% of conversations are noisy duplicates
of a progenitor — noise kinds mirror the reference's true-match phenomena:

* ``typo``   — char swap/drop (exercises levenshtein / jaro-winkler,
  reference ``character_based_func.py``)
* ``abbrev`` — "avenue"→"ave", "drive"→"dr" … (mirrors reference pairs
  like "Dillard Drive Elementary School" / "Dillard Dr Elementary")
* ``jitter`` — stopword & punctuation noise (absorbed by the canonical
  tokenizer, reference ``load_data/tokenizer.py:24-50``)
* ``exact``  — verbatim copy (the auto-label-1 rule,
  ``load_data/label_data.py:75-76``)

Rows are emitted in seeded-shuffled order so stable turn ordering
(``turn_idx``) is genuinely exercised downstream. Everything derives from
``random.Random(seed)`` — same seed, same bytes, any machine.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from .vocab import (
    ABBREVIATIONS,
    FILLER_WORDS,
    NAME_WORDS,
    ROLES,
    STREET_WORDS,
    TOOLS,
    TYPE_WORDS,
)

_BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
TRUTH_SCHEMA = "conv_id string, entity_id string"


@dataclass
class GenResult:
    rows: list[tuple] = field(default_factory=list)  # transcripts rows
    truth: list[tuple] = field(default_factory=list)  # (conv_id, entity_id)


def _entity_phrase(rng: random.Random) -> str:
    """A POI-style entity name, 2-4 content words."""
    parts = [rng.choice(NAME_WORDS)]
    if rng.random() < 0.55:
        parts.append(rng.choice(STREET_WORDS))
    parts.append(rng.choice(TYPE_WORDS))
    if rng.random() < 0.25:
        parts.append(rng.choice(STREET_WORDS))
    return " ".join(parts)


def _filler(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(FILLER_WORDS) for _ in range(n)]


def _base_turns(rng: random.Random, phrase: str, hot_token: str | None) -> list[str]:
    """Turn texts for a progenitor conversation; the entity phrase appears
    in the first user turn and once more later, filler elsewhere."""
    n_turns = rng.randint(2, 12)
    turns: list[str] = []
    phrase_turn2 = rng.randrange(1, n_turns) if n_turns > 1 else 0
    for t in range(n_turns):
        n_fill = rng.randint(3, 12)
        words = _filler(rng, n_fill)
        if t == 0:
            pos = rng.randrange(len(words) + 1)
            words[pos:pos] = phrase.split()
            if hot_token is not None:
                words.insert(0, hot_token)
        elif t == phrase_turn2 and rng.random() < 0.7:
            words[0:0] = phrase.split()
        turns.append(" ".join(words))
    return turns


def _typo(rng: random.Random, word: str) -> str:
    if len(word) < 4:
        return word
    i = rng.randrange(1, len(word) - 1)
    if rng.random() < 0.5:  # swap
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    return word[:i] + word[i + 1 :]  # drop


def _apply_noise(rng: random.Random, turns: list[str], kind: str) -> list[str]:
    if kind == "exact":
        return list(turns)
    out: list[str] = []
    for text in turns:
        words = text.split()
        if kind == "typo":
            # one typo per ~8 words, at least one in the first turn
            for i in range(len(words)):
                if len(words[i]) >= 4 and rng.random() < 0.12:
                    words[i] = _typo(rng, words[i])
        elif kind == "abbrev":
            words = [
                ABBREVIATIONS[w] if w in ABBREVIATIONS and rng.random() < 0.8 else w
                for w in words
            ]
        elif kind == "jitter":
            jittered: list[str] = []
            for w in words:
                if rng.random() < 0.1:
                    jittered.append(rng.choice(["the", "a", "and", "is", "it"]))
                if rng.random() < 0.08:
                    w = w + rng.choice([",", ".", "!", "?", ";"])
                jittered.append(w)
            words = jittered
        out.append(" ".join(words))
    return out


NOISE_KINDS = ["exact", "typo", "abbrev", "jitter"]


def generate_transcripts(
    n_convs: int = 2000,
    seed: int = 42,
    dup_fraction: float = 0.30,
    hot_fraction: float = 0.0,
    hot_token: str = "order",
) -> GenResult:
    """Generate ``n_convs`` conversations; ``dup_fraction`` of them are
    noisy duplicates of a progenitor (cluster sizes 2-5). ``hot_fraction``
    of entities additionally share ``hot_token`` as the leading token of
    turn 0 — the skew fixture (FIXTURES.md §4)."""
    rng = random.Random(seed)
    res = GenResult()

    # Build cluster plan: list of cluster sizes summing to n_convs.
    sizes: list[int] = []
    remaining = n_convs
    target_dups = int(n_convs * dup_fraction)
    dups = 0
    while remaining > 0:
        if dups < target_dups and remaining >= 2 and rng.random() < 0.5:
            size = min(rng.randint(2, 5), remaining, 1 + target_dups - dups)
            dups += size - 1
        else:
            size = 1
        sizes.append(size)
        remaining -= size

    conv_no = 0
    for ent_no, size in enumerate(sizes):
        entity_id = f"ent_{ent_no:06d}"
        phrase = _entity_phrase(rng)
        hot = hot_token if rng.random() < hot_fraction else None
        base = _base_turns(rng, phrase, hot)
        for member in range(size):
            conv_id = f"conv_{conv_no:08d}"
            conv_no += 1
            kind = "exact" if member == 0 else rng.choice(NOISE_KINDS)
            turns = _apply_noise(rng, base, kind)
            conv_ts = _BASE_TS + dt.timedelta(hours=conv_no)
            for turn_idx, text in enumerate(turns):
                res.rows.append(
                    (
                        conv_id,
                        turn_idx,
                        ROLES[turn_idx % len(ROLES)],
                        text,
                        rng.choice(TOOLS),
                        conv_ts + dt.timedelta(seconds=30 * turn_idx),
                    )
                )
            res.truth.append((conv_id, entity_id))

    rng.shuffle(res.rows)  # stable turn ordering must be earned, not given
    return res


def transcripts_df(spark, n_convs: int = 2000, seed: int = 42, **kw):
    """Spark DataFrame of the generated transcripts (shuffled row order).

    Built through pandas so the driver→JVM transfer goes over Arrow
    (createDataFrame on a list of tuples serializes row-by-row through
    py4j — 10x slower at bench sizes)."""
    import pandas as pd

    res = generate_transcripts(n_convs=n_convs, seed=seed, **kw)
    pdf = pd.DataFrame(
        res.rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf, TRANSCRIPTS_SCHEMA)


def truth_df(spark, n_convs: int = 2000, seed: int = 42, **kw):
    res = generate_transcripts(n_convs=n_convs, seed=seed, **kw)
    return spark.createDataFrame(res.truth, TRUTH_SCHEMA)
