"""BPE induction vs a pure-Python reference implementation."""

import duckdb

from python_cdc_component_spark.queries import QUERIES


def _ref_bpe(texts, n_merges):
    """Reference single-process BPE (Sennrich-style word-level variant):
    count adjacent token pairs, merge the (count desc, a, b)-best,
    greedy left-to-right non-overlapping application."""
    corpus = [t.split(" ") for t in texts]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for toks in corpus:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        new_corpus = []
        for toks in corpus:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_corpus.append(out)
        corpus = new_corpus
    return merges


def test_bpe_matches_reference(spark, sf_dir):
    got = {(r["rank"], r["left"], r["right"], r["freq"])
           for r in QUERIES["bpe_merges"](spark, sf_dir).collect()}
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    want = {(i, a, b, c)
            for i, (a, b, c) in enumerate(_ref_bpe(texts, 5))}
    assert got == want
    assert len(got) == 5


def test_bpe_encode_matches_pure_python(spark, sf_dir):
    """Tokenizer apply: running the corpus through the learned merges
    (one mapInPandas pass) yields exactly the token lists the pure-
    Python reference produces applying the same merges in order."""
    import duckdb as _duck
    from python_cdc_component_spark.operators.llm.bpe import bpe_encode

    rows = _duck.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    texts = [t for _, t in rows]
    merges = [(a, b) for a, b, _ in _ref_bpe(texts, 5)]

    def ref_apply(toks):
        for a, b in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    want = {d: ref_apply(t.split(" ")) for d, t in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: list(r["t"])
           for r in bpe_encode(docs, merges).collect()}
    assert got == want
    # at least one document actually merged something
    assert any(len(want[d]) < len(t.split(" ")) for d, t in rows)
