"""Planted-pair recall harness for the MinHash/LSH family.

The instrument VERDICT r7 found missing: candidate-pair *counts* cannot
distinguish "same retrieval quality" from "lost true pairs + gained false
ones" — the r7 ``MINHASH_SLICES`` 4→2 shortcut kept plausible pair counts
while planted near-dups went missing.  This harness plants pairs of KNOWN
shingle Jaccard (computed exactly in Python from the same word-shingle
definition the operators use) at ~0.6 / ~0.7 / ~0.8, runs the production
``minhash_candidate_pairs`` pipeline, and measures recall per Jaccard band
against the LSH S-curve ``P = 1 - (1 - J^r)^b``.

Any future change to the hash family (slice count, mixing constants,
digest) must keep ``test_minhash_recall_tracks_lsh_theory`` green and
re-record the study table in BENCH/BASELINE.md ("MinHash slice-count
recall study").  Run the study standalone (both slice counts) with::

    python -m pytest tests/test_minhash_recall.py -q -s
"""

from __future__ import annotations

import pytest

from patito_spark.functions import hashing
from patito_spark.operators.dedup import minhash_candidate_pairs

#: harness LSH shape — sharper S-curve than the operator defaults so the
#: theory gap at J=0.6/0.7/0.8 is wide enough to detect family damage
NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_N = 3


def _shingles(tokens: list) -> set:
    n = SHINGLE_N
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def _planted_corpus(pairs_per_level: int = 60, fillers: int = 120):
    """Deterministic corpus of planted near-dup pairs plus disjoint
    filler docs.

    Each pair: a base doc of L all-distinct tokens and a mutant with m
    well-separated tokens replaced — every replacement flips exactly
    ``SHINGLE_N`` shingles, so J = (S - mn)/(S + mn) is dialed by m; the
    TRUE Jaccard is still computed from the actual shingle sets.  Token
    vocabularies are disjoint across pairs and fillers (doc-indexed
    prefixes), so no accidental cross-pair shingle overlap exists and
    every candidate hit traces to LSH, not luck.

    Returns ``(rows, truth)``: rows of ``(id, text)``, and
    ``truth[(id_lo, id_hi)] = (level_label, true_jaccard)``.  The
    ``0.7/short`` level (7-9-token docs, the r7 incident shape — that
    planted pair produced ZERO candidates under S=2) keeps the harness
    sensitive to few-shingle content, where correlated families have
    the fewest effective coordinates and per-pair collision odds swing
    hardest from the S-curve.
    """
    # label -> (L, m, mode) variants.  mode "interior": each replacement
    # flips SHINGLE_N shingles, J = (S-3m)/(S+3m).  mode "last": replace
    # the final token only — flips exactly ONE shingle, J = (S-1)/(S+1),
    # which is how J≈0.7 is reachable on 7-9-token docs (the r7 failure
    # shape: 'words entirely now' vs 'words entirely today').
    levels = {
        "0.8": [(110, 4, "interior"), (128, 5, "interior"),
                (146, 5, "interior"), (164, 6, "interior")],
        "0.7": [(110, 6, "interior"), (128, 7, "interior"),
                (146, 8, "interior"), (164, 9, "interior")],
        "0.7/short": [(7, 1, "last"), (8, 1, "last"),
                      (9, 1, "last"), (8, 1, "last")],
        "0.6": [(110, 9, "interior"), (128, 10, "interior"),
                (146, 12, "interior"), (164, 13, "interior")],
    }
    rows, truth = [], {}
    doc_id = 0
    pair_idx = 0
    for label in sorted(levels):
        made = 0
        while made < pairs_per_level:
            L, m, mode = levels[label][made % len(levels[label])]
            base = [f"p{pair_idx}w{i}" for i in range(L)]
            mutant = list(base)
            if mode == "last":
                mutant[L - 1] = f"p{pair_idx}r0"
            else:
                # interior, >= SHINGLE_N apart: replacements never
                # share a shingle window
                stride = (L - 2 * SHINGLE_N) // m
                assert stride >= SHINGLE_N
                for t in range(m):
                    mutant[SHINGLE_N + t * stride] = f"p{pair_idx}r{t}"
            sa, sb = _shingles(base), _shingles(mutant)
            j = len(sa & sb) / len(sa | sb)
            a, b = doc_id, doc_id + 1
            rows.append((a, " ".join(base)))
            rows.append((b, " ".join(mutant)))
            truth[(a, b)] = (label, j)
            doc_id += 2
            pair_idx += 1
            made += 1
    for i in range(fillers):
        rows.append((doc_id, " ".join(f"f{i}w{k}" for k in range(120))))
        doc_id += 1
    return rows, truth


def _lsh_theory(j: float) -> float:
    return 1.0 - (1.0 - j**ROWS_PER_BAND) ** BANDS


def measure_recall(spark, slices: int) -> dict:
    """Recall per planted level under ``MINHASH_SLICES = slices``.

    Returns ``{label: (recall, theory, n_pairs)}``.  Restores the module
    constant afterwards — the production value is whatever hashing.py
    declares, this harness only probes alternatives.
    """
    rows, truth = _planted_corpus()
    df = spark.createDataFrame(rows, "id bigint, text string")
    prev = hashing.MINHASH_SLICES
    hashing.MINHASH_SLICES = slices
    try:
        got = {
            (r["id_a"], r["id_b"])
            for r in minhash_candidate_pairs(
                df,
                "id",
                "text",
                num_hashes=NUM_HASHES,
                bands=BANDS,
                shingle_n=SHINGLE_N,
            ).collect()
        }
    finally:
        hashing.MINHASH_SLICES = prev
    out = {}
    labels = sorted({lab for lab, _ in truth.values()})
    for label in labels:
        pairs = [(p, j) for p, (lab, j) in truth.items() if lab == label]
        hit = sum(1 for p, _ in pairs if p in got)
        mean_j = sum(j for _, j in pairs) / len(pairs)
        out[label] = (hit / len(pairs), _lsh_theory(mean_j), len(pairs))
    return out


def test_planted_corpus_jaccards_land_in_bands():
    _, truth = _planted_corpus(pairs_per_level=4, fillers=0)
    for label in ("0.6", "0.7", "0.7/short", "0.8"):
        js = [j for lab, j in truth.values() if lab == label]
        assert js, f"no pairs landed in the {label} level"
        target = float(label.split("/")[0])
        assert all(abs(j - target) < 0.06 for j in js)


def test_minhash_recall_tracks_lsh_theory(spark):
    """The production family's recall must sit on the LSH S-curve —
    at EVERY level, including short docs.

    Margin: with 60 pairs/level the binomial std is ≤ 0.065, so
    theory − 0.16 is ≈ 2.5σ — a family that merely *estimates Jaccard
    honestly* never trips this.  (The corpus and hash constants are
    fully deterministic, so these recalls are exact reproducible
    numbers, not samples — see BENCH/BASELINE.md recall study.)
    """
    recall = measure_recall(spark, hashing.MINHASH_SLICES)
    print("\nMinHash planted-pair recall (S=%d):" % hashing.MINHASH_SLICES)
    for label, (r, theory, n) in sorted(recall.items()):
        print(f"  J≈{label}: recall {r:.3f} vs theory {theory:.3f} (n={n})")
        assert r >= theory - 0.16, (
            f"J≈{label}: recall {r:.3f} below LSH theory {theory:.3f} - .16 "
            "— the hash family is losing true near-dup pairs"
        )
    assert recall["0.8"][0] >= 0.85


@pytest.mark.study
def test_minhash_slice_count_study(spark):
    """The r8 slice-count study: S=2 vs S=4 on the same planted corpus.

    The instrument property: an honest family sits ON the S-curve at
    every level; a correlated one deviates content-dependently — S=2
    measured ABOVE theory at J≈0.7 (0.983 vs 0.910: inflated
    candidates) and BELOW at J≈0.6 (0.633 vs 0.688: lost true pairs),
    2.4× the total deviation of S=4.  Reproduce the BENCH/BASELINE.md
    table with ``pytest tests/test_minhash_recall.py -m study -s``.
    """
    table = {s: measure_recall(spark, s) for s in (2, 4)}
    print("\nMinHash slice-count recall study (theory = LSH S-curve):")
    dev = {2: 0.0, 4: 0.0}
    for label in sorted(table[4]):
        _, theory, n = table[4][label]
        r2, r4 = table[2][label][0], table[4][label][0]
        dev[2] += abs(r2 - theory)
        dev[4] += abs(r4 - theory)
        print(
            f"  J≈{label}: S=2 recall {r2:.3f} | S=4 recall {r4:.3f} "
            f"| theory {theory:.3f} (n={n})"
        )
    print(f"  total |recall-theory|: S=2 {dev[2]:.3f} | S=4 {dev[4]:.3f}")
    # the r7 defect class: S=2's deviation from the S-curve dwarfs S=4's
    # (measured 0.182 vs 0.076 — everything here is deterministic: fixed
    # corpus, fixed hash constants)
    assert dev[4] < dev[2]
    # and its direction at J≈0.7 is OVER-recall — the candidate-pair
    # inflation family of defects (the pair COUNT looks fine or better,
    # which is exactly why counts can't validate a family) — while S=4
    # sits on the curve.  The LOST-true-pairs direction on specific real
    # text is pinned by the streaming ingest tests' planted near-dup.
    r2, (r4, theory, _) = table[2]["0.7"][0], table[4]["0.7"]
    assert r2 > theory + 0.05
    assert abs(r4 - theory) < 0.05
