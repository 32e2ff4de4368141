"""Anchor-text profiles (pipelines/anchors.py): exact aggregation
values, top-anchor tie-breaks, null-src exclusion, driver==shuffle."""

import pandas as pd
import pyarrow as pa


def _pages() -> pa.Table:
    def page(url, *links):
        body = "".join(f'<a href="{t}">{a}</a>' for t, a in links)
        return {"url": url, "html": f"<html><body>{body}</body></html>".encode()}

    rows = [
        # target T gets: 2x "click" (from p1, p2), 1x "here" (p1),
        # 1x "also" (p3) -> top_anchor "click", 4 inlinks, 3 sources,
        # 3 distinct anchors
        page("http://s.x/p1", ("http://t.x/T", "click"), ("http://t.x/T", "here")),
        page("http://s.x/p2", ("http://t.x/T", "click")),
        page("http://s.x/p3", ("http://t.x/T", "also")),
        # target U: tie 1x "a" vs 1x "b" -> lexicographic min "a" wins
        page("http://s.x/p4", ("http://t.x/U", "b"), ("http://t.x/U", "a")),
        # null-src page: its links must NOT count
        page(None, ("http://t.x/T", "ghost"), ("http://t.x/V", "v")),
        # page with no links
        page("http://s.x/p5"),
    ]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )


def _got(mode):
    import ray.data

    from shaclapi_ray.pipelines.anchors import anchor_text_profile

    ds = ray.data.from_arrow(_pages()).repartition(3)
    return (
        anchor_text_profile(ds, mode=mode)
        .to_pandas()
        .sort_values("target_url")
        .reset_index(drop=True)
    )


def test_anchor_profile_values(ray_session):
    got = _got("auto")
    exp = pd.DataFrame(
        {
            "target_url": ["http://t.x/T", "http://t.x/U"],
            "n_inlinks": [4, 2],
            "n_unique_sources": [3, 1],
            "n_distinct_anchors": [3, 2],
            "top_anchor": ["click", "a"],
        }
    )
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


def test_anchor_profile_shuffle_equals_driver(ray_session):
    a = _got("driver")
    b = _got("shuffle")
    pd.testing.assert_frame_equal(a, b)
