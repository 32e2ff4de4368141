"""Page-curation flagship (pipelines/curate.py): the composed chain
must equal running its three stages by hand, checkpoint boundaries must
be output-identical to in-memory ones, and each stage must actually
filter something on a corpus built to trigger all three."""

import pandas as pd
import pyarrow as pa


def _pages() -> pa.Table:
    # host a: many pages incl. recrawls (latest bites) and duplicated
    # text (hostcure bites at 50% dup + min_docs=4); host b: clean but
    # over the cap; host c: small and clean (untouched)
    rows = []
    for i in range(6):
        rows.append((f"http://a.x/p{i}", 10, "same body everywhere"))
    rows.append(("http://a.x/p0", 20, "recrawled newer text"))  # recrawl
    for i in range(5):
        rows.append((f"http://b.y/q{i}", 30 + i, f"unique words {i} pad pad"))
    rows.append(("http://c.z/r0", 40, "tiny host fine"))
    rows.append(("http://c.z/r1", 41, "tiny host also fine"))
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


KW = dict(max_dup_pct=50, min_mean_tokens=0, min_docs=4)
CAP = 3


def _norm(ds):
    df = ds.to_pandas()
    df["ts"] = df["warc_ts"].astype("int64")
    return (
        df[["url", "ts", "text"]]
        .sort_values(["url", "ts"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )


def _ds():
    import ray.data

    return ray.data.from_arrow(_pages()).repartition(3)


def test_curate_equals_manual_stages(ray_session):
    from shaclapi_ray.pipelines.curate import curate_pages
    from shaclapi_ray.pipelines.freshness import cap_per_host, latest_snapshot
    from shaclapi_ray.pipelines.hostcure import filter_by_host, host_curation

    s1 = latest_snapshot(_ds()).materialize()
    v = host_curation(s1, **KW).materialize()
    s2 = filter_by_host(s1, v).materialize()
    manual = _norm(cap_per_host(s2, CAP))
    composed = _norm(curate_pages(_ds(), cap_k=CAP, **KW))
    pd.testing.assert_frame_equal(composed, manual)
    # every stage bit: recrawl winner only (p0@20 kept, p0@10 gone),
    # host a blocked entirely (5/6 of its latest docs are dups),
    # host b capped at 3, host c untouched
    urls = composed["url"].tolist()
    assert "http://a.x/p0" not in urls and "http://a.x/p1" not in urls
    assert sorted(u for u in urls if u.startswith("http://b.y")) == [
        "http://b.y/q0",
        "http://b.y/q1",
        "http://b.y/q2",
    ]
    assert {"http://c.z/r0", "http://c.z/r1"} <= set(urls)


def test_curate_checkpoint_equals_memory(ray_session, tmp_path):
    from shaclapi_ray.pipelines.curate import curate_pages

    mem = _norm(curate_pages(_ds(), cap_k=CAP, **KW))
    ck = _norm(
        curate_pages(_ds(), cap_k=CAP, checkpoint_dir=str(tmp_path), **KW)
    )
    pd.testing.assert_frame_equal(ck, mem)


def test_curate_resume_reuses_completed_stages(ray_session, tmp_path):
    """resume=True reads back marker-complete stage dirs instead of
    recomputing: poisoning s1's parquet AFTER a completed run changes
    the resumed output (proof it was not recomputed), while a fresh
    dir reproduces the original."""
    import glob

    import pyarrow.parquet as pq

    from shaclapi_ray.pipelines.curate import curate_pages

    base = _norm(
        curate_pages(_ds(), cap_k=CAP, checkpoint_dir=str(tmp_path), **KW)
    )
    # poison the LAST checkpointed stage's output (s2 — s1 is shadowed
    # by s2's own marker): drop every host-b row from the checkpoint
    for f in glob.glob(str(tmp_path / "s2_hosts" / "*.parquet")):
        t = pq.read_table(f)
        import pyarrow.compute as pc

        t2 = t.filter(
            pc.invert(pc.match_substring(pc.fill_null(t["url"], ""), "b.y"))
        )
        pq.write_table(t2, f)
    resumed = _norm(
        curate_pages(
            _ds(), cap_k=CAP, checkpoint_dir=str(tmp_path), resume=True, **KW
        )
    )
    assert not resumed["url"].str.contains("b.y", na=False).any()
    assert len(resumed) < len(base)


def test_curate_all_join_strategies_identical(ray_session):
    """Every stage's beyond-ceiling fallback is reachable from the
    composed flagship and output-identical to the broadcast chain."""
    from shaclapi_ray.pipelines.curate import curate_pages

    a = _norm(curate_pages(_ds(), cap_k=CAP, **KW))
    b = _norm(
        curate_pages(
            _ds(),
            cap_k=CAP,
            latest_strategy="join",
            host_strategy="join",
            cap_strategy="join",
            **KW,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_curate_urlq_gate_equals_manual(ray_session):
    """urlq_kw prepends the URL gate as stage 0: composed == gate by
    hand then the 3-stage chain; the gate must actually drop rows here
    (digit-heavy and scheme-less urls planted) without touching the
    downstream stage semantics."""
    import ray.data

    from shaclapi_ray.pipelines.curate import curate_pages
    from shaclapi_ray.pipelines.extract import url_quality_frame

    t = _pages()
    extra = pa.table(
        {
            "url": pa.array(
                ["b.y/noscheme", "http://a.x/9999999999999"], pa.string()
            ),
            "warc_ts": pa.array([50, 51], pa.timestamp("us")),
            "text": pa.array(["dropped by gate", "digit heavy"], pa.string()),
        }
    )
    full = pa.concat_tables([t, extra])
    urlq = dict(max_len=64, max_digit_pct=40, max_slashes=8)

    def gate(batch):
        return batch.filter(
            url_quality_frame(batch, **urlq)["kept"].combine_chunks()
        )

    gated = ray.data.from_arrow(full).repartition(3).map_batches(
        gate, batch_format="pyarrow"
    )
    manual = _norm(curate_pages(gated, cap_k=CAP, **KW))
    composed = _norm(
        curate_pages(
            ray.data.from_arrow(full).repartition(3),
            cap_k=CAP,
            urlq_kw=urlq,
            **KW,
        )
    )
    pd.testing.assert_frame_equal(composed, manual)
    urls = composed["url"].tolist()
    assert "b.y/noscheme" not in urls
    assert "http://a.x/9999999999999" not in urls
    # the gate dropped rows but the ungated chain keeps them: proof the
    # stage is live, not a pass-through
    ungated = _norm(curate_pages(ray.data.from_arrow(full), cap_k=CAP, **KW))
    assert "b.y/noscheme" in ungated["url"].tolist()
