"""Deduplication operator tests: vectorized-kernel goldens (simhash,
minhash), driver-vs-distributed label equivalence, LSH recall on planted
near-duplicates, and scale-path invariants (no driver text/matrix
collects — enforced by construction, checked here for behavior)."""

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog today",  # near-dup of 0
    "a completely different document about ray data pipelines",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    "",
]


def _docs_ds(texts=TEXTS):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_exact_dedup_min_id_and_counts(ray_session):
    from shaclapi_ray.pipelines.dedup import exact_dedup

    df = exact_dedup(_docs_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    by_id = dict(zip(df.doc_id, df.n_dups))
    assert by_id[0] == 2  # docs 0 and 4 identical, min id survives
    assert 4 not in by_id
    assert by_id[1] == 1 and by_id[2] == 1 and by_id[3] == 1
    assert df.n_dups.sum() == len(TEXTS)


def test_simhash_matches_independent_accumulation(ray_session):
    """Golden check: the vectorized simhash equals a per-token reference
    implementation using the same md5-low-64 token hash (the hash that
    DuckDB's md5_number_lower reproduces, making simhash oracle-able)."""
    import hashlib

    from shaclapi_ray.pipelines.dedup import simhash_signatures

    df = simhash_signatures(_docs_ds()).to_pandas().sort_values("doc_id")
    for doc_id, text in enumerate(TEXTS):
        toks = text.split()
        if not toks:
            expected = 0
        else:
            acc = np.zeros(64, dtype=np.int64)
            for w in toks:
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
                for i in range(64):
                    acc[i] += 1 if (h >> i) & 1 else -1
            val = sum(1 << i for i in range(64) if acc[i] > 0)
            expected = val - (1 << 64) if val >= (1 << 63) else val
        got = int(df[df.doc_id == doc_id].simhash.iloc[0])
        assert got == expected, f"doc {doc_id}"
    # near-dups have small hamming distance; unrelated docs large
    h0 = int(df[df.doc_id == 0].simhash.iloc[0])
    h1 = int(df[df.doc_id == 1].simhash.iloc[0])
    h2 = int(df[df.doc_id == 2].simhash.iloc[0])
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(h0, h1) < ham(h0, h2)
    assert int(df[df.doc_id == 4].simhash.iloc[0]) == h0  # exact dup


def test_minhash_clusters_exact_and_near_dups(ray_session):
    from shaclapi_ray.pipelines.dedup import minhash_lsh_clusters

    df = (
        minhash_lsh_clusters(_docs_ds())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by_id = dict(zip(df.doc_id, df.cluster_id))
    assert by_id[0] == by_id[4] == 0  # exact dup clusters with min id
    assert by_id[1] == 0  # near-dup joins the cluster
    assert by_id[2] == 2 and by_id[3] == 3  # singletons keep own id


def test_minhash_driver_vs_distributed_labels(ray_session):
    """VERDICT item 6: the distributed min-label propagation must produce
    the same clusters as the driver union-find."""
    import random

    rng = random.Random(31)
    words = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split(),
        "kilo lima mike november oscar papa quebec romeo sierra tango".split(),
        "uniform victor whiskey xray yankee zulu anchor beacon cinder dune".split(),
        "ember forge grove harbor inlet jetty krill lagoon meadow nectar".split(),
        "onyx prism quartz ripple summit thicket umbra vortex willow zenith".split(),
    ]
    texts = []
    for g in range(5):
        t = " ".join(rng.sample(words[g] * 4, 30))  # distinct vocab per cluster
        texts.extend([t, t + " extra", t + " other tail"])  # 5 clusters of 3
    texts.append("outlier document entirely unlike the rest of this corpus")
    from shaclapi_ray.pipelines.dedup import minhash_lsh_clusters

    a = (
        minhash_lsh_clusters(_docs_ds(texts), labeling="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        minhash_lsh_clusters(_docs_ds(texts), labeling="distributed")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # sanity: the clusters are real (15 docs in 5 clusters + 1 singleton)
    n_clusters = a.cluster_id.nunique()
    assert n_clusters == 6


def test_ngram_jaccard_pairs_distributed(ray_session):
    from shaclapi_ray.pipelines.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs_ds(), threshold=0.5)
    df = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pairs = set(zip(df.a, df.b))
    assert (0, 4) in pairs  # exact dup: inter == union
    assert (0, 1) in pairs  # near-dup above threshold
    row04 = df[(df.a == 0) & (df.b == 4)].iloc[0]
    assert row04.inter_size == row04.union_size
    # values are exact char-5-gram set sizes
    sh = lambda t: {t[i : i + 5] for i in range(len(t) - 4)}
    s0, s1 = sh(TEXTS[0]), sh(TEXTS[1])
    row01 = df[(df.a == 0) & (df.b == 1)].iloc[0]
    assert row01.inter_size == len(s0 & s1)
    assert row01.union_size == len(s0 | s1)


def test_simhash_neardup_matches_bruteforce_within_bucket(ray_session):
    """Pairs = same 16-bit bucket AND hamming <= d; verify against a
    brute-force recomputation from the signatures themselves."""
    texts = TEXTS + [TEXTS[0] + " slight change", TEXTS[2] + " tail"]
    from shaclapi_ray.pipelines.dedup import (
        simhash_neardup_pairs,
        simhash_signatures,
    )

    sigs = simhash_signatures(_docs_ds(texts)).to_pandas()
    df = (
        simhash_neardup_pairs(_docs_ds(texts), max_hamming=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    expected = set()
    rows = list(sigs.itertuples())
    for i, r1 in enumerate(rows):
        for r2 in rows[i + 1 :]:
            if r1.bucket != r2.bucket:
                continue
            ham = bin((int(r1.simhash) ^ int(r2.simhash)) & ((1 << 64) - 1)).count("1")
            if ham <= 8:
                a, b = sorted((int(r1.doc_id), int(r2.doc_id)))
                expected.add((a, b, ham))
    assert set(zip(df.a, df.b, df.hamming)) == expected
    assert (0, 4) in {(a, b) for a, b, _ in expected}  # exact dup pair present


def _planted_embeddings(n=120, dim=32, n_dup_pairs=8, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, ids = [], []
    vid = 0
    expected = set()
    for i in range(n):
        rows.append(base[i])
        ids.append(vid)
        vid += 1
    for i in range(n_dup_pairs):
        # planted near-dup: tiny perturbation of vector i -> cos > 0.99
        v = base[i] + 0.02 * rng.standard_normal(base.shape[1])
        v /= np.linalg.norm(v)
        rows.append(v)
        ids.append(vid)
        expected.add((i, vid))
        vid += 1
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in rows], pa.list_(pa.float32())
                ),
            }
        )
    )
    return ds, expected


def test_embedding_bruteforce_finds_planted_pairs(ray_session):
    from shaclapi_ray.pipelines.dedup import embedding_neardup_pairs

    ds, expected = _planted_embeddings()
    df = embedding_neardup_pairs(ds, tau=0.95, method="bruteforce").to_pandas()
    got = set(zip(df.a, df.b))
    assert expected <= got
    # no wildly-false positives: random 32-dim vectors almost never reach 0.95
    assert len(got - expected) <= 2


def test_embedding_lsh_recall_on_planted_pairs(ray_session):
    """The bucketed multi-table LSH path (vectors carried through the
    shuffle, no driver matrix) must recover the planted high-sim pairs."""
    from shaclapi_ray.pipelines.dedup import embedding_neardup_pairs

    ds, expected = _planted_embeddings()
    df = embedding_neardup_pairs(ds, tau=0.95, method="lsh").to_pandas()
    got = set(zip(df.a, df.b))
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9
    # LSH never invents pairs below tau: all results verified exactly
    bf = set(
        zip(
            *embedding_neardup_pairs(ds, tau=0.95, method="bruteforce")
            .to_pandas()[["a", "b"]]
            .values.T
        )
    )
    assert got <= bf


def test_dedup_corpus_exact(ray_session):
    """End-to-end materializer: doc 4 (exact dup of 0) is dropped, every
    other row survives with all columns intact."""
    from shaclapi_ray.pipelines.dedup import dedup_corpus

    df = dedup_corpus(_docs_ds()).to_pandas().sort_values("doc_id")
    assert df.doc_id.tolist() == [0, 1, 2, 3, 5]
    assert list(df.columns) == ["doc_id", "text"]
    assert df[df.doc_id == 0].text.iloc[0] == TEXTS[0]


def test_dedup_corpus_exact_antijoin_path(ray_session, monkeypatch):
    """Forcing the drop set over the broadcast ceiling exercises the
    hash-partitioned anti-join fallback; results are identical."""
    import shaclapi_ray.pipelines.dedup as d

    monkeypatch.setattr(d, "DROPSET_BROADCAST_LIMIT", 0)
    df = d.dedup_corpus(_docs_ds()).to_pandas().sort_values("doc_id")
    assert df.doc_id.tolist() == [0, 1, 2, 3, 5]
    assert list(df.columns) == ["doc_id", "text"]


def test_dedup_corpus_minhash_drops_neardups(ray_session):
    """Near-dup texts (0, 1, 4 cluster together under MinHash-LSH) reduce
    to the min doc_id; unrelated docs survive."""
    from shaclapi_ray.pipelines.dedup import dedup_corpus, minhash_lsh_clusters

    kept = set(
        dedup_corpus(_docs_ds(), strategy="minhash").to_pandas().doc_id.tolist()
    )
    cl = minhash_lsh_clusters(_docs_ds()).to_pandas()
    dropped = set(cl[cl.doc_id != cl.cluster_id].doc_id)
    assert kept == set(range(len(TEXTS))) - dropped
    assert 0 in kept and 2 in kept and 3 in kept
    assert 4 not in kept  # exact dup always clusters with 0


def test_simhash_bucket_bits_widens(ray_session):
    """Wider prefixes refine buckets: every 24-bit bucket maps to exactly
    one 16-bit bucket (its top 16 bits), and candidate pairs under the
    finer bucketing are a subset of the coarser ones."""
    from shaclapi_ray.pipelines.dedup import (
        simhash_neardup_pairs,
        simhash_signatures,
    )

    texts = TEXTS + [TEXTS[0] + " slight change"]
    s16 = simhash_signatures(_docs_ds(texts)).to_pandas().set_index("doc_id")
    s24 = (
        simhash_signatures(_docs_ds(texts), bucket_bits=24)
        .to_pandas()
        .set_index("doc_id")
    )
    for i in s16.index:
        assert int(s24.bucket[i]) >> 8 == int(s16.bucket[i])
    p16 = set(
        map(tuple, simhash_neardup_pairs(_docs_ds(texts), max_hamming=8)
            .to_pandas()[["a", "b"]].itertuples(index=False))
    )
    p24 = set(
        map(tuple, simhash_neardup_pairs(_docs_ds(texts), max_hamming=8, bucket_bits=24)
            .to_pandas()[["a", "b"]].itertuples(index=False))
    )
    assert p24 <= p16


def test_dedup_paragraphs_first_occurrence_wins(ray_session):
    """Corpus-wide paragraph dedup: a repeated paragraph survives only at
    its first (doc_id, idx) occurrence; docs reassemble in order; a doc
    whose every paragraph is seen before comes back empty."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import dedup_paragraphs

    boiler = "COPYRIGHT FOOTER"
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": f"intro zero\n\n{boiler}"},
            {"doc_id": 1, "text": f"{boiler}\n\nbody one\n\n{boiler}"},
            {"doc_id": 2, "text": boiler},
            {"doc_id": 3, "text": "body one\n\nfresh tail"},
        ]
    )
    out = (
        dedup_paragraphs(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 2, 3]
    assert out.clean_text[0] == f"intro zero\n\n{boiler}"  # first occurrence kept
    assert out.clean_text[1] == "body one"  # both boiler copies dropped
    assert out.clean_text[2] == ""  # fully-duplicate doc -> empty
    assert out.clean_text[3] == "fresh tail"  # 'body one' seen in doc 1
    assert out.n_kept.tolist() == [2, 1, 0, 1]
    assert out.n_dropped.tolist() == [0, 2, 1, 1]


def test_dedup_paragraphs_join_equals_broadcast(ray_session):
    """The partition-join paragraph-dedup path must be output-identical
    to the broadcast path (the beyond-PARA_BROADCAST_LIMIT scale form)."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import dedup_paragraphs

    boiler = "COPYRIGHT FOOTER"
    rows = [
        {"doc_id": 0, "text": f"intro zero\n\n{boiler}"},
        {"doc_id": 1, "text": f"{boiler}\n\nbody one\n\n{boiler}"},
        {"doc_id": 2, "text": boiler},
        {"doc_id": 3, "text": "body one\n\nfresh tail"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "unique paragraph only"},
    ]
    docs = ray.data.from_items(rows).repartition(3)
    a = (
        dedup_paragraphs(docs, strategy="broadcast")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup_paragraphs(docs, strategy="join")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert b["n_dropped"].sum() > 0


def test_dedup_paragraphs_join_no_duplicates(ray_session):
    """Join path with no repeated paragraphs: everything kept, identical
    to broadcast."""
    import ray.data

    from shaclapi_ray.pipelines.dedup import dedup_paragraphs

    rows = [
        {"doc_id": 0, "text": "one\n\ntwo"},
        {"doc_id": 1, "text": "three\n\nfour"},
    ]
    docs = ray.data.from_items(rows).repartition(2)
    a = dedup_paragraphs(docs, strategy="broadcast").to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    b = dedup_paragraphs(docs, strategy="join").to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert a.equals(b)
    assert (b["n_dropped"] == 0).all()


def test_dedup_paragraphs_broadcast_ceiling_is_loud(ray_session, monkeypatch):
    """Above PARA_BROADCAST_LIMIT the winner broadcast must fail loudly
    with a message pointing at strategy='join'."""
    import pytest
    import ray.data

    import shaclapi_ray.pipelines.dedup as d

    monkeypatch.setattr(d, "PARA_BROADCAST_LIMIT", 0)
    docs = ray.data.from_items([{"doc_id": 0, "text": "a\n\nb"}])
    with pytest.raises(ValueError, match="strategy='join'"):
        d.dedup_paragraphs(docs).materialize()


def test_kgram_sets_batch_equals_single():
    """The batch-vectorized gram-set builder must be element-identical to
    the per-text kernel on every edge (empty, short, unicode, repeated
    grams, None)."""
    import numpy as np

    from shaclapi_ray.pipelines.dedup import _kgram_sets_batch, _kgram_void_set

    texts = [
        "abcdefg",
        "",
        "abc",
        "ababababab",
        "δelta ünïcode ΔΔΔ text",
        None,
        "aaaaa",
        "short",
    ]
    ids = np.arange(len(texts), dtype=np.int64)
    for k in (2, 5, 7):
        got = _kgram_sets_batch(ids, np.array(texts, dtype=object), k)
        for i, t in enumerate(texts):
            exp = _kgram_void_set(t or "", k)
            assert np.array_equal(got[int(i)], exp), (k, i, t)
