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


def _outlink_pages() -> pa.Table:
    rows = [
        # two copies of the same url (aggregate as one profile, n_pages=2)
        ("http://a.x/p", '<a href="http://a.x/q">i</a><a href="http://b.y/r">e</a>'),
        ("http://a.x/p", '<a href="http://a.x/q">i</a>'),
        # zero-link page
        ("http://c.z/empty", "no anchors here"),
        # relative link from an http page: '' host, external by equality
        ("http://b.y/s", '<a href="rel/path">rel</a>'),
        # null url: carries no links, no profile row
        (None, '<a href="http://a.x/q">ghost</a>'),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1].encode() for r in rows], pa.binary()),
        }
    )


def test_outlink_profile_values(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.anchors import outlink_profile

    ds = ray.data.from_arrow(_outlink_pages()).repartition(2)
    got = (
        outlink_profile(ds)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "url": ["http://a.x/p", "http://b.y/s", "http://c.z/empty"],
            "n_pages": [2, 1, 1],
            "n_links": [3, 1, 0],          # a.x/p: 2+1 across its copies
            "n_unique_hosts": [2, 1, 0],   # {a.x, b.y}; {''}
            "n_internal": [2, 0, 0],       # both a.x->a.x links
        }
    )
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


def test_outlink_profile_shuffle_equals_driver(ray_session):
    import ray.data

    from shaclapi_ray.pipelines.anchors import outlink_profile

    def run(mode):
        ds = ray.data.from_arrow(_outlink_pages()).repartition(2)
        return (
            outlink_profile(ds, mode=mode)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run("driver"), run("shuffle"))
