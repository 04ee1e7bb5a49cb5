"""pipeline_curate_shard: the composed curation pipeline face.

Two independent checks beside the DuckDB exact gate:
- a pure-Python (hashlib + re + union-find) replay of every stage — exact
  dedup, MinHash/LSH keep-list, quality gate, temperature thinning, shard
  manifest — asserting the manifest integers bit-for-bit;
- a plan-shape gate bounding the composition's shuffle count and banning
  cartesian products / row-Python UDFs, so a refactor can't silently turn
  the one-plan composition into something that won't survive 100 TB.
"""
import hashlib
import math
import re

from process_nwb_spark.plans.inspect import formatted_plan
from tests.conftest import SF_CORRECT


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _python_replay(docs):
    """docs: list of (doc_id, lang, text, n_chars) — replicate the face."""
    # exact dedup: normalized md5, keep min doc_id
    by_fp = {}
    for did, _, text, _ in docs:
        fp = _md5(re.sub(r"\s+", " ", text.strip()).lower())
        by_fp.setdefault(fp, []).append(did)
    exact_keep = {min(v) for v in by_fp.values()}

    # MinHash signatures (8 sigs = min md5(sh + ':s')), 4 bands of 2
    sigs = {}
    for did, _, text, _ in docs:
        words = text.split(" ")
        if len(words) < 3:
            continue
        shs = {f"{words[i]} {words[i+1]} {words[i+2]}"
               for i in range(max(len(words) - 2, 0))}
        if not shs:
            continue
        sigs[did] = [min(_md5(f"{sh}:{s}") for sh in shs) for s in range(8)]
    buckets = {}
    for did, sg in sigs.items():
        for b in range(4):
            buckets.setdefault((b, _md5(sg[2 * b] + sg[2 * b + 1])),
                               []).append(did)
    # connected components over candidate pairs -> keep min of component
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for mem in buckets.values():
        for other in mem[1:]:
            ra, rb = find(mem[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    near_keep = {did for did, _, _, _ in docs
                 if find(did) == did}

    # quality gate: integer stopword bucket >= 1
    def bucket(text):
        s_en = len(re.findall(r"\b(?:the|and|of)\b", text.lower()))
        n_tok = max(len(re.findall(r"\w+", text)), 1)
        return min((s_en * 20) // n_tok, 9)

    # temperature thresholds from RAW lang strata
    counts = {}
    for _, lang, _, _ in docs:
        counts[lang] = counts.get(lang, 0) + 1
    n = sum(counts.values())
    den = 0.0
    for lang in sorted(counts):   # ordered fold, lang-sorted
        den = den + math.sqrt(counts[lang] / n)
    thr = {}
    for lang, c in counts.items():
        p = c / n
        w = math.sqrt(p) / den
        thr[lang] = int(math.floor(min(1.0, 0.5 * w / p) * 65536.0))

    manifest = {}
    for did, lang, text, n_chars in docs:
        if did not in exact_keep or did not in near_keep:
            continue
        if bucket(text) < 1:
            continue
        u = int(_md5(str(did))[:4], 16)
        if u >= thr[lang]:
            continue
        sh = u % 8
        m = manifest.setdefault(sh, [0, 0, 0, 0])
        m[0] += 1
        m[1] += u
        m[2] += u * u
        m[3] += n_chars
    return manifest


def test_pipeline_curate_shard_matches_python_replay(spark):
    from process_nwb_spark.relational.core import all_queries

    docs = [(r.doc_id, r.lang, r.text, r.n_chars)
            for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "lang", "text", "n_chars").collect()]
    want = _python_replay(docs)
    got = {r.shard: [r.n_docs, r.sum_u, r.sum_uu, r.sum_chars]
           for r in all_queries()["pipeline_curate_shard"]
           .fn(spark, SF_CORRECT).collect()}
    assert got == want
    assert sum(v[0] for v in got.values()) > 0   # pipeline keeps something
    assert len(got) >= 4                         # and spreads over shards


def test_pipeline_curate_shard_plan_shape(spark):
    from process_nwb_spark.relational.core import all_queries

    # a previously-populated lang-strata cache changes the PRINTED plan
    # (InMemoryTableScan embeds its build plan, inflating the Exchange
    # text count by 4) without changing what executes — shape-check the
    # cold plan
    spark.catalog.clearCache()
    df = all_queries()["pipeline_curate_shard"].fn(spark, SF_CORRECT)
    plan = formatted_plan(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan          # no row-Python in the path
    # shuffle budget for the whole composition: fp window + semi-join
    # chain + LSH band join + strata agg + final shard agg + sort. The
    # bound is deliberately loose (localCheckpoint hides the LSH
    # pipeline's internal exchanges behind a scan) but catches a
    # quadratic rewrite or a lost broadcast (rates/den must broadcast,
    # never shuffle the corpus on lang).
    n_ex = plan.count("Exchange")
    assert n_ex <= 14, f"composition grew to {n_ex} exchanges:\n{plan}"
    assert "BroadcastHashJoin" in plan            # mix thresholds broadcast
