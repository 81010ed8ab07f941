"""Off-seed adversarial sweep driver — rerun the committed fuzz suites'
generators and oracles over FRESH seed ranges (the pinned pytest seeds
verify determinism; this tool hunts beyond them).

    python tools/fuzz_sweep.py bool  [--seeds 1000:1012] [--per 8]
    python tools/fuzz_sweep.py qs    [--seeds 3000:3020] [--per 6]
    python tools/fuzz_sweep.py slop  [--seeds 5000:5006] [--per 10]
    python tools/fuzz_sweep.py exp   [--seeds 11000:11001] [--per 120]

Prints one line per mismatch and a final `SWEEP DONE fails=N`.
The round-5 closing sweep of these three (plus an msearch variant)
covered ~650 bodies over 30+ seeds and surfaced exactly one seam —
must_not-only bool bodies raising instead of returning ES's zero-score
complement — fixed and pinned in tests/test_es_fuzz.py.
"""

from __future__ import annotations

import argparse
import random
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def _spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def _fuzz_fixture(spark):
    """The test_es_fuzz corpus/index/oracle set, built directly."""
    from pyspark.sql import functions as F

    import test_es_fuzz as T
    from newssearchengine_spark.datagen import source_files
    from newssearchengine_spark.oracle import pure
    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex
    from newssearchengine_spark.sources.corpus import assign_doc_ids

    docs = assign_doc_ids(source_files(spark, 300, seed=77, partitions=4),
                          num_partitions=4)
    one = docs.select("doc_id", "repo",
                      F.col("content").alias("text")).persist()
    d = tempfile.mkdtemp(prefix="sweep_") + "/idx"
    build_index(one, d, T.CFG, text_col="text", meta_cols=("repo",),
                resume=False)
    si = SegmentIndex(spark, d)
    raw = {r["doc_id"]: r["text"]
           for r in one.select("doc_id", "text").collect()}
    oidx = pure.OracleIndex.build(raw, si.analyzer)
    dt = {k: set(pure.analyze(t, si.analyzer)) for k, t in raw.items()}
    return T, si, raw, oidx, dt


def sweep_bool(seeds, per) -> int:
    from newssearchengine_spark.plans.dsl import es_search

    spark = _spark()
    T, si, raw, oidx, dt = _fuzz_fixture(spark)
    vocab = T._vocab(si, oidx)
    orc = T._Oracle(si, oidx, dt)
    fails = 0
    for seed in seeds:
        rng = random.Random(seed)
        for i in range(per):
            bspec = T._gen_bool(rng, vocab)
            got = {r["doc_id"]: r["score"] for r in es_search(
                si, {"query": {"bool": bspec}},
                size=len(raw) + 10).collect()}
            rb = float(bspec.get("boost", 1.0))
            want = {}
            for dd in raw:
                r = orc.node(bspec, dd)
                if r is not None and r[0]:
                    want[dd] = round(r[1] * rb, 6)
            if sorted(got) != sorted(want):
                fails += 1
                print(f"MATCH-SET seed={seed}#{i}: {bspec}")
                continue
            for dd, s in got.items():
                if abs(s - want[dd]) > 2e-6:
                    fails += 1
                    print(f"SCORE seed={seed}#{i} doc={dd}: {bspec}")
                    break
    return fails


def sweep_qs(seeds, per) -> int:
    from newssearchengine_spark.plans.dsl import es_search

    spark = _spark()
    T, si, raw, oidx, dt = _fuzz_fixture(spark)
    vocab = T._vocab(si, oidx)
    fails = 0
    for seed in seeds:
        rng = random.Random(seed)
        for i in range(per):
            pool = list(dict.fromkeys(vocab))
            rng.shuffle(pool)
            n_ops = rng.randint(2, 4)
            operands = [[pool.pop() for _ in range(rng.randint(1, 2))]
                        for _ in range(n_ops)]
            ops = [rng.choice(["AND", "OR"]) for _ in range(n_ops - 1)]
            parts = [" ".join(operands[0])]
            for op, opr in zip(ops, operands[1:]):
                parts += [op, " ".join(opr)]
            grammar = " ".join(parts)
            boost = rng.choice([1.0, 2.0, 0.5])
            field = "text" if boost == 1.0 else f"text^{boost:g}"
            dop = rng.choice(["or", "and"])
            got = {r["doc_id"]: r["score"] for r in es_search(
                si, {"query": {"query_string": {
                    "query": grammar, "fields": [field],
                    "default_operator": dop}}},
                size=len(raw) + 10).collect()}
            groups = []
            for seg in grammar.split(" OR "):
                ands = []
                for chunk in seg.split(" AND "):
                    if dop == "and":
                        for w in chunk.split():
                            ands.append(sorted(set(si.analyze_query(w))))
                    else:
                        ands.append(sorted(set(si.analyze_query(chunk))))
                groups.append(ands)
            want = {}
            for dd in raw:
                s, matched = 0.0, False
                for g in groups:
                    if all(any(t in dt[dd] for t in opr) for opr in g):
                        matched = True
                        s += oidx.score([t for opr in g for t in opr], dd)
                if matched:
                    want[dd] = round(s * boost, 6)
            if sorted(got) != sorted(want):
                fails += 1
                print(f"QS MATCH-SET seed={seed}#{i} dop={dop}: "
                      f"{grammar!r}")
                continue
            for dd, s in got.items():
                if abs(s - want[dd]) > 2e-6:
                    fails += 1
                    print(f"QS SCORE seed={seed}#{i}: {grammar!r}")
                    break
    return fails


def sweep_slop(seeds, per) -> int:
    import test_phrase_slop as P
    from newssearchengine_spark.oracle import pure
    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex
    from newssearchengine_spark.sources.corpus import assign_doc_ids

    spark = _spark()
    voc = ["alpha", "beta", "gamma", "delta", "zeta"]
    fails = 0
    for seed in seeds:
        rng = random.Random(seed)
        texts = [" ".join(rng.choice(voc)
                          for _ in range(rng.randint(4, 14)))
                 for _ in range(40)]
        rows = [(f"r/{i}", f"f{i}.py", "c0", "python", t)
                for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "repo string, path string, commit string, "
                  "lang string, content string")
        corpus = assign_doc_ids(df, num_partitions=4).persist()
        id_of = {r["path"]: r["doc_id"]
                 for r in corpus.select("path", "doc_id").collect()}
        d = tempfile.mkdtemp(prefix="slop_sweep_") + "/idx"
        build_index(corpus, d, P.CFG)
        si = SegmentIndex(spark, d)
        toks = {id_of[f"f{i}.py"]: pure.analyze(t, P.CFG.analyzer)
                for i, t in enumerate(texts)}
        for j in range(per):
            phrase = rng.sample(voc, rng.choice([2, 2, 3]))
            slop = rng.randint(0, 4)
            got = [(r["doc_id"], round(r["score"], 6)) for r in
                   si.search_phrase(phrase, 50, slop=slop).collect()]
            want = [(dd, round(s, 6)) for dd, s in
                    P.expected_topk(toks, phrase, slop, 50, si.stats)]
            if got != want:
                fails += 1
                print(f"SLOP seed={seed}#{j} {phrase} slop={slop}")
        corpus.unpersist()
    return fails


def sweep_exp(seeds, per) -> int:
    """Random prefix/wildcard/regexp/fuzzy patterns: engine dictionary
    expansions vs a pure-python oracle replicating the documented
    (df desc / dist asc, term asc) order and max_expansions cap."""
    import re
    from collections import Counter

    from newssearchengine_spark.oracle import pure

    spark = _spark()
    T, si, raw, _oidx, _dt = _fuzz_fixture(spark)
    df = Counter()
    for t in raw.values():
        for tok in set(pure.analyze(t, si.analyzer)):
            df[tok] += 1
    dict_terms = sorted(df)

    def lev(a, b):
        if abs(len(a) - len(b)) > 2:
            return 99
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    fails = 0
    for seed in seeds:
        rng = random.Random(seed)
        for _ in range(per):
            base = rng.choice(dict_terms)
            kind = rng.choice(["prefix", "wildcard", "regexp", "fuzzy"])
            mx = rng.choice([3, 5, 50])
            if kind == "prefix":
                pat = base[:rng.randint(1, max(1, len(base) - 1))]
                got = si.expand_prefix(pat, max_expansions=mx)
                cand = [t for t in dict_terms if t.startswith(pat)]
                want = sorted(cand, key=lambda t: (-df[t], t))[:mx]
            elif kind == "wildcard":
                i = rng.randint(0, len(base) - 1)
                j = rng.randint(i + 1, len(base))
                pat = (base[:i]
                       + ("*" if rng.random() < 0.6 else "?") + base[j:])
                got = si.expand_wildcard(pat, max_expansions=mx)
                rx = re.compile("^" + "".join(
                    ".*" if c == "*" else "." if c == "?"
                    else re.escape(c) for c in pat) + "$")
                cand = [t for t in dict_terms if rx.match(t)]
                want = sorted(cand, key=lambda t: (-df[t], t))[:mx]
            elif kind == "regexp":
                i = rng.randint(1, len(base) - 1) if len(base) > 1 else 1
                pat = re.escape(base[:i]) + rng.choice(
                    [".*", "[a-z]+", ".?" + re.escape(base[i:]),
                     re.escape(base[i:]) + "{1}"])
                got = si.expand_regexp(pat, max_expansions=mx)
                rx = re.compile("^(?:" + pat + ")$")
                cand = [t for t in dict_terms if rx.match(t)]
                want = sorted(cand, key=lambda t: (-df[t], t))[:mx]
            else:
                me = rng.choice([1, 2])
                pl = rng.choice([0, 0, 1, 2])
                got = si.expand_fuzzy(base, max_edits=me, prefix_len=pl,
                                      max_expansions=mx)
                cand = [t for t in dict_terms
                        if (pl == 0 or t.startswith(base[:pl]))
                        and lev(t, base) <= me]
                want = sorted(
                    cand, key=lambda t: (lev(t, base), -df[t], t))[:mx]
            if got != want:
                fails += 1
                print(f"EXP MISMATCH {kind} seed={seed}: "
                      f"got={got[:5]} want={want[:5]}")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["bool", "qs", "slop", "exp"])
    ap.add_argument("--seeds", default="")
    ap.add_argument("--per", type=int, default=0)
    args = ap.parse_args()
    defaults = {"bool": ("1000:1012", 8), "qs": ("3000:3020", 6),
                "slop": ("5000:5006", 10), "exp": ("11000:11001", 120)}
    srange, per = defaults[args.what]
    if args.seeds:
        srange = args.seeds
    if args.per:
        per = args.per
    lo, hi = (int(x) for x in srange.split(":"))
    fails = {"bool": sweep_bool, "qs": sweep_qs, "slop": sweep_slop,
             "exp": sweep_exp}[args.what](range(lo, hi), per)
    print(f"SWEEP DONE fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
