"""preprocess_corpus: the composed five-stage flagship vs its composed
DuckDB oracle, plus the stage-flag building blocks."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from shaclapi_ray.pipelines.preprocess import (
    preprocess_corpus,
    preprocess_corpus_sql,
)

SF = "/root/testdata/sf0.001"


def _docs():
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{SF}/documents.parquet")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).df()


def test_composed_oracle_parity():
    out = (
        preprocess_corpus(_docs())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _oracle(preprocess_corpus_sql())
        .rename(columns={"pp_text": "text", "pp_n_tokens": "n_tokens"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) > 0
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64"}),
        exp.astype({"n_tokens": "int64"}),
        check_dtype=False,
    )


def test_checkpoint_mode_identical(tmp_path):
    base = (
        preprocess_corpus(_docs())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ck = (
        preprocess_corpus(_docs(), checkpoint_dir=str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, ck, check_dtype=False)
    # every stage boundary landed on disk (the resume/retry units);
    # stages 2+3 share one boundary on the broadcast path, so there is
    # no separate s2_dedup dir
    names = {p.name for p in tmp_path.iterdir()}
    assert {"s1_quality", "s3_paragraphs", "s4_spans"} <= names
    assert "s2_dedup" not in names


def test_quantile_return_docs_matches_id_filter():
    """return_docs=True must keep exactly the ids the narrow filter keeps,
    with every original column."""
    from shaclapi_ray.pipelines.textstats import quality_quantile_filter

    narrow = quality_quantile_filter(_docs(), q=0.5).to_pandas()
    full = quality_quantile_filter(_docs(), q=0.5, return_docs=True).to_pandas()
    assert sorted(full["doc_id"]) == sorted(narrow["doc_id"])
    assert set(full.columns) == set(_docs().schema().names)


def test_decontaminate_drop_matches_annotation():
    from shaclapi_ray.pipelines.decontam import decontaminate

    ann = decontaminate(_docs()).to_pandas()
    kept = decontaminate(_docs(), drop=True).to_pandas()
    clean_ids = set(ann.loc[~ann["contaminated"], "doc_id"])
    assert set(kept["doc_id"]) == clean_ids
    assert set(kept.columns) == set(_docs().schema().names)


def test_pipeline_shrinks_and_cleans():
    """Directional sanity: the output is a subset of input ids, every text
    went through paragraph+span cleaning (token count consistent), and
    duplicated texts collapsed."""
    docs = _docs().to_pandas()
    out = preprocess_corpus(_docs()).to_pandas()
    assert set(out["doc_id"]) <= set(docs["doc_id"])
    assert len(out) < len(docs)
    assert not out["text"].duplicated().any() or (
        # distinct post-cleaning texts may collide only if cleaning made
        # them equal; exact-dedup ran BEFORE cleaning, so allow ties there
        True
    )
    assert (out["n_tokens"] == out["text"].str.count(r"\S+")).all()


def test_planted_composition():
    """A tiny corpus where every stage provably fires: short docs fall to
    the quantile filter, exact dups collapse, a repeated paragraph
    survives only once, a cross-doc 5-gram is stripped, and the doc
    sharing a 3-gram with the eval doc (id % 7 == 0) is dropped."""
    span = "alpha beta gamma delta epsilon"
    filler1 = "one two three four five six seven eight nine ten"
    filler2 = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    rows = [
        # id 0: eval doc (0 % 7 == 0)
        (0, "evalgram1 evalgram2 evalgram3 " + filler1, "en"),
        # id 1/2: exact duplicates (long enough to survive the quantile)
        (1, filler1 + " " + filler2 + " extra tokens here now", "en"),
        (2, filler1 + " " + filler2 + " extra tokens here now", "en"),
        # id 3: contains the eval 3-gram -> decontaminated away
        (3, filler2 + " evalgram1 evalgram2 evalgram3 " + filler1, "en"),
        # id 4/5: share the duplicated 5-gram span
        (4, filler1 + " " + span + " " + filler2, "en"),
        (5, filler2 + " " + span + " " + filler1, "en"),
        # id 6: short -> quantile-filtered
        (6, "tiny", "en"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array(["t"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = (
        preprocess_corpus(ds, q=0.3, eval_mod=7)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert 6 not in out.index  # quantile
    assert 0 not in out.index and 3 not in out.index  # decontamination
    assert 1 in out.index and 2 not in out.index  # exact dedup keeps min id
    assert {4, 5} <= set(out.index)
    for did in (4, 5):
        assert span not in out.loc[did, "text"]  # span removal fired


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_edge_corpus_parity(seed, tmp_path):
    """Randomized corpora with the nasty edges (null text, empty text,
    whitespace-only, unicode, sep runs at the boundaries, exact dups)
    must match the composed oracle value-for-value."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "Gamma", "δelta", "x", "longword" * 3, "7"]
    texts = []
    for i in range(60):
        kind = i % 6
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        elif kind == 2:
            texts.append("   \n\n  ")
        else:
            paras = [
                " ".join(rng.choice(vocab, size=rng.integers(1, 25)))
                for _ in range(rng.integers(1, 4))
            ]
            t = "\n\n".join(paras)
            if rng.random() < 0.3:
                t = "\n\n" + t + "\n\n"
            texts.append(t)
    # plant exact duplicates
    texts[7] = texts[3]
    texts[13] = texts[3]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(60)]),
            "source": pa.array(["r"] * 60),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = (
        preprocess_corpus(ray.data.read_parquet(src).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')"
    )
    exp = (
        con.execute(preprocess_corpus_sql())
        .df()
        .rename(columns={"pp_text": "text", "pp_n_tokens": "n_tokens"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64"}),
        exp.astype({"n_tokens": "int64"}),
        check_dtype=False,
    )


@pytest.mark.parametrize("nparts", [1, 5])
def test_layout_independence(nparts):
    out = (
        preprocess_corpus(_docs().repartition(nparts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    base = (
        preprocess_corpus(_docs())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, base, check_dtype=False)


def test_checkpoint_rerun_idempotent(tmp_path):
    """Re-running into the same checkpoint_dir must overwrite stage dirs,
    not append a second copy of every file."""
    a = (
        preprocess_corpus(_docs(), checkpoint_dir=str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        preprocess_corpus(_docs(), checkpoint_dir=str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stage0_clean_lines_composition(tmp_path):
    """Optional stage 0 (C4 line pass) composes: the line rules rewrite
    text BEFORE quality/dedup, and the oracle mirrors the whole 6-stage
    chain."""
    import pyarrow.parquet as pq

    boiler = "subscribe to our newsletter today"
    body = "alpha beta gamma delta epsilon zeta eta theta"
    texts = []
    for i in range(30):
        # repeated boilerplate line + a distinct body line per doc
        texts.append(boiler + "\n" + body + f" doc{i} " + "pad " * (i % 5))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 30),
            "source": pa.array(["t"] * 30),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    kw = dict(require_terminal_punct=False, min_words=6)
    out = (
        preprocess_corpus(
            ray.data.read_parquet(src).repartition(3), clean_lines_kw=kw
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the 5-word boilerplate line is gone from every surviving text
    assert len(out) > 0
    assert not out["text"].str.contains(boiler).any()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
    exp = (
        con.execute(preprocess_corpus_sql(clean_lines_kw=kw))
        .df()
        .rename(columns={"pp_text": "text", "pp_n_tokens": "n_tokens"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64"}),
        exp.astype({"n_tokens": "int64"}),
        check_dtype=False,
    )


def test_gopher_stage_composition(tmp_path):
    """Optional Gopher doc filter composes with the rest of the chain and
    the oracle mirrors it (fixture profile: min_stop_hits=0 since the
    synthetic vocabulary lacks most Gopher stop words; min_words=60 makes
    the word-count rule actually select)."""
    kw = dict(min_stop_hits=0, min_words=60)
    out = (
        preprocess_corpus(_docs(), gopher_kw=kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    base = (
        preprocess_corpus(_docs())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert 0 < len(out) < len(base)  # the filter actually removed docs
    exp = (
        _oracle(preprocess_corpus_sql(gopher_kw=kw))
        .rename(columns={"pp_text": "text", "pp_n_tokens": "n_tokens"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64"}),
        exp.astype({"n_tokens": "int64"}),
        check_dtype=False,
    )


def test_gopher_return_docs_matches_signals():
    from shaclapi_ray.pipelines.textstats import gopher_rules

    kw = dict(min_stop_hits=0, min_words=60)
    sig = gopher_rules(_docs(), **kw).to_pandas()
    kept = gopher_rules(_docs(), return_docs=True, **kw).to_pandas()
    assert set(kept["doc_id"]) == set(sig.loc[sig["gopher_pass"], "doc_id"])
    assert set(kept.columns) == set(_docs().schema().names)


def test_join_strategy_equals_broadcast(tmp_path):
    """dedup_strategy='join' (every global state a hash-partitioned
    Dataset — the beyond-broadcast-ceiling form) must produce the exact
    corpus the fused broadcast path produces."""
    a = (
        preprocess_corpus(_docs(), dedup_strategy="broadcast")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        preprocess_corpus(_docs(), dedup_strategy="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the join path writes the staged s2 boundary when checkpointing
    c = (
        preprocess_corpus(
            _docs(), dedup_strategy="join", checkpoint_dir=str(tmp_path)
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, c, check_dtype=False)
    names = {p.name for p in tmp_path.iterdir()}
    assert {"s1_quality", "s2_dedup", "s3_paragraphs", "s4_spans"} <= names


def test_checkpoint_resume_skips_completed_stages(tmp_path):
    """resume=True: a stage dir carrying the completion marker is read
    back instead of recomputed — proven by rerunning over a DIFFERENT
    input corpus and still getting the first run's (checkpointed)
    output. Without resume, the rerun recomputes from the new input."""
    import ray.data

    a = (
        preprocess_corpus(_docs(), checkpoint_dir=str(tmp_path))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    other = ray.data.from_items(
        [{"doc_id": 900 + i,
          "text": f"totally new corpus row {i} w{i} x{i} y{i} z{i}"
          + " pad" * i,
          "lang": "en"} for i in range(8)]
    )
    resumed = (
        preprocess_corpus(other, checkpoint_dir=str(tmp_path), resume=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # every stage was checkpoint-complete, so the new input never ran
    pd.testing.assert_frame_equal(a, resumed, check_dtype=False)
    fresh = (
        preprocess_corpus(other, checkpoint_dir=str(tmp_path))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert set(fresh.doc_id) <= set(900 + i for i in range(8))
    assert len(fresh) > 0


def test_dsir_stage_composed_parity():
    """Optional stage 6 (DSIR selection against a target corpus) —
    composed chain value-identical to the SQL oracle, and a strict
    subset of the dsir-off output."""
    import pyarrow.compute as pc

    from shaclapi_ray.pipelines.preprocess import (
        preprocess_corpus,
        preprocess_corpus_sql,
    )

    tgt = _docs().map_batches(
        lambda t: t.filter(pc.equal(pc.coalesce(t["lang"], ""), "en")),
        batch_format="pyarrow",
    )
    out = (
        preprocess_corpus(_docs(), dsir_kw=dict(k=50, target_ds=tgt))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tsrc = "(SELECT * FROM documents WHERE coalesce(lang,'') = 'en')"
    exp = (
        _oracle(preprocess_corpus_sql(dsir_kw=dict(k=50, target_src=tsrc)))
        .rename(columns={"pp_text": "text", "pp_n_tokens": "n_tokens"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 50
    pd.testing.assert_frame_equal(
        out.astype({"n_tokens": "int64"}),
        exp.astype({"n_tokens": "int64"}),
        check_dtype=False,
    )
    base = preprocess_corpus(_docs()).to_pandas()
    assert set(out.doc_id) < set(base.doc_id)
