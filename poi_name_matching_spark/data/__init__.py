"""Deterministic synthetic-data generators (seeded; no external data).

The reference's golden inputs are hand-labeled pickles of POI name pairs
(``load_data/baseline.py:118-123``). This sandbox cannot ship those, so the
fixtures are synthesized deterministically per FIXTURES.md: a transcripts
table with planted duplicate conversations (the pipeline input mandated by
BASELINE.json ``input_hint``) and a labeled-pairs table mirroring the
reference's central relation (``load_data/label_data.py:50``).
"""

from .transcripts import generate_transcripts, transcripts_df, truth_df
from .labeled_pairs import generate_labeled_pairs, labeled_pairs_df

__all__ = [
    "generate_transcripts",
    "transcripts_df",
    "truth_df",
    "generate_labeled_pairs",
    "labeled_pairs_df",
]
