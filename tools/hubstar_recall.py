"""Hub-star recall sweep (round-6 verdict #7): MEASURE what the LSH
bucket-cap skew guard actually costs.

The cap replaces an oversized (band, key) bucket's C(m,2) candidate pairs
with an O(m) star on the bucket's min id.  Its documented caveat: a
member whose similarity to the HUB is sub-threshold loses its intra-bucket
edges even when its similarity to OTHER members clears the threshold.
This sweep plants a near-dup cluster with GRADED similarity (member i
mutates i words of a shared template, so hub-similarity decays with i),
computes exact ground-truth pairs driver-side, and reports for
bucket_cap ∈ {8, 16, 64, ∞}:

- pair recall      — fraction of true (jaccard ≥ t) pairs emitted;
- component intact — does union-find over emitted pairs keep every
                     ground-truth component connected (the metric dedup
                     actually needs: keep-one-per-cluster only requires
                     CONNECTIVITY, not completeness);
- emitted pairs    — the cost the cap bought back.

Run: python tools/hubstar_recall.py   (table → stdout; paste into
BASELINE.md and pick the default cap from the data).
"""

from __future__ import annotations

import itertools
import random
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from modal_vector_db_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402

THRESHOLD = 0.4
SHINGLE_N = 3
WORDS = 60          # template length
CLUSTER = 96        # graded members: member i mutates i%32 words
FILLER = 800


def _docs() -> list[tuple[int, str]]:
    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(4000)]
    template = [vocab[rng.randrange(len(vocab))] for _ in range(WORDS)]
    docs = []
    for i in range(CLUSTER):
        words = list(template)
        n_mut = i % 32  # graded: 0..31 mutated words, cycled
        for p in rng.sample(range(WORDS), n_mut):
            words[p] = vocab[rng.randrange(len(vocab))]
        docs.append((i, " ".join(words)))
    for i in range(FILLER):
        docs.append(
            (CLUSTER + i, " ".join(vocab[rng.randrange(len(vocab))] for _ in range(WORDS)))
        )
    return docs


def _shingles(text: str) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + SHINGLE_N]) for i in range(len(w) - SHINGLE_N + 1)}


def main() -> None:
    docs = _docs()
    sh = {i: _shingles(t) for i, t in docs}
    truth = set()
    for a, b in itertools.combinations(range(CLUSTER), 2):
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j >= THRESHOLD:
            truth.add((a, b))
    # ground-truth components over the full doc set (filler pairs too —
    # random 60-word docs essentially never collide at t=0.4)
    parent = list(range(len(docs)))

    def find(x, p):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def comps(pairs, n):
        p = list(range(n))
        for a, b in pairs:
            ra, rb = find(a, p), find(b, p)
            if ra != rb:
                p[ra] = rb
        groups: dict[int, set[int]] = {}
        for x in range(n):
            groups.setdefault(find(x, p), set()).add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    truth_comps = comps(truth, len(docs))

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")

    print(f"cluster={CLUSTER} graded members, filler={FILLER}, "
          f"true pairs={len(truth)}, true components={len(truth_comps)}")
    print()
    # Two baselines: exact truth (includes LSH banding's own probabilistic
    # miss — identical for every cap) and the UNCAPPED LSH output (isolates
    # what the CAP alone costs: pairs lost + components split vs inf).
    results = {}
    for cap in (None, 8, 16, 64):
        t0 = time.time()
        rows = minhash_lsh_pairs(
            df, "doc_id", "text",
            threshold=THRESHOLD, shingle_n=SHINGLE_N, bucket_cap=cap,
        ).collect()
        dt = time.time() - t0
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in rows
        }
        results[cap] = (got, dt)
    base_pairs, _ = results[None]
    base_comps = comps(base_pairs, len(docs))
    print("| bucket_cap | recall vs truth | recall vs uncapped | "
          "components intact vs uncapped | emitted pairs | wall s |")
    print("|---|---|---|---|---|---|")
    for cap in (8, 16, 64, None):
        got, dt = results[cap]
        got_cluster = {p for p in got if p[0] < CLUSTER and p[1] < CLUSTER}
        r_truth = len(got_cluster & truth) / len(truth) if truth else 1.0
        r_base = len(got & base_pairs) / len(base_pairs) if base_pairs else 1.0
        got_comps = comps(got, len(docs))
        intact = all(any(bc <= gc for gc in got_comps) for bc in base_comps)
        cap_s = "inf" if cap is None else str(cap)
        print(
            f"| {cap_s} | {r_truth:.3f} | {r_base:.3f} | "
            f"{'yes' if intact else 'NO'} | {len(got)} | {dt:.1f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
