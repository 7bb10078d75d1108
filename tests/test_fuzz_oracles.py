"""Seeded fast-profile oracle fuzz in the CI suite (VERDICT r3 #10).

tools/fuzz_oracles.py caught 4 latent parity bugs in round 3 as a
manual tool; this keeps a bounded sweep running on every pytest pass:
one adversarial warehouse (nulls / unicode / dups / PII / layout +
html payloads / degenerate events), one seed, the parity families
where cross-engine drift has historically appeared. The full all-query
multi-seed sweep remains the manual tool.
"""

import os
import sys
import tempfile

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")

# the families where parity bugs were actually found (round-3 fuzz) +
# the two surfaces added since (pdfish_extract, span-heavy extract)
FAST_PROFILE = [
    "extract_passthrough",
    "status_profile",
    "pdfish_extract",
    "lang_id_ngram",
    "exact_dedup",
    "minhash_dups",
    "simhash_dups",
    "decontaminate",
    "events_sessions",
    "fingerprint",
    "pii_scrub",
    "repetition_stats",
    "window_dedup",
    "pack_examples",
    # round-4e scoring family: keyword_search exercises the empty-result
    # schema path (zero hits on the fuzz corpus is the interesting case)
    "keyword_search",
    "rarity_score",
    "tfidf_topterms",
    "quantile_filter",
    # md5-modular-arithmetic parity families (the historic drift class)
    "cms_counts",
    "weighted_sample",
    # null-group discipline over the fuzz warehouse's null keys
    "events_hourly_users",
    "doc_stats_by_lang",
    "source_overlap",
]


@pytest.mark.fuzz
def test_fuzz_oracles_fast_profile(ray_session):
    sys.path.insert(0, TOOLS)
    try:
        from check_oracles import main as check
        from fuzz_oracles import build_warehouse
    finally:
        sys.path.remove(TOOLS)

    with tempfile.TemporaryDirectory(prefix="ior_fuzz_ci_") as tmp:
        build_warehouse(tmp, seed=4242)
        # check() sys.exits(1) on any mismatch; success returns None
        check(tmp, only=FAST_PROFILE)
