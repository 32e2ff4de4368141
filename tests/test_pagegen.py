import pyarrow.parquet as pq

from shaclapi_ray.pagegen import (
    generate_pages,
    n_rows_for_sf_dir,
    pages_parquet_paths,
    row_text,
    row_url,
)


def test_scale_mapping():
    assert n_rows_for_sf_dir("/root/testdata/sf0.001") == 2_000
    assert n_rows_for_sf_dir("/root/testdata/sf0.01") == 20_000
    assert n_rows_for_sf_dir("/root/testdata/sf0.1") == 200_000


def test_generation_deterministic_and_idempotent(tmp_path):
    d1 = generate_pages(str(tmp_path / "a"), 300)
    d2 = generate_pages(str(tmp_path / "b"), 300)
    t1 = pq.read_table(pages_parquet_paths(d1)[0])
    t2 = pq.read_table(pages_parquet_paths(d2)[0])
    assert t1.equals(t2)
    # idempotent: second call is a no-op (manifest matches)
    import os

    mtime = os.path.getmtime(pages_parquet_paths(d1)[0])
    generate_pages(str(tmp_path / "a"), 300)
    assert os.path.getmtime(pages_parquet_paths(d1)[0]) == mtime


def test_planted_violations_present(tmp_path):
    d = generate_pages(str(tmp_path / "v"), 200)
    t = pq.read_table(pages_parquet_paths(d)[0])
    urls = t["url"].to_pylist()
    langs = t["lang"].to_pylist()
    texts = t["text"].to_pylist()
    assert urls[13] == "" and urls[113] == ""
    assert urls[41] is None
    assert not urls[27].startswith("https://")
    assert langs[19] == "" and langs[31] == "xx" and langs[67] is None
    assert len(texts[3]) < 10
    assert len(texts[71]) > 100_000


def test_text_is_pure_function_of_index():
    assert row_text(5) == row_text(5)
    assert row_url(41) is None
    assert row_text(71 + 100).startswith("page 171 body ")
