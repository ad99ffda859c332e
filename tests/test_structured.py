"""OpenGraph / JSON-LD structured-data extraction."""

import pyarrow as pa
import ray.data as rd

from xtract.structured import extract_structured, extract_structured_one


def _one(html: str) -> dict:
    return extract_structured_one(html.encode())


def test_no_structured_data_defaults():
    r = _one("<html><body><p>x</p></body></html>")
    assert r == {"og_title": None, "og_description": None, "og_type": None,
                 "n_ldjson": 0, "ld_types": "", "ld_name": None}


def test_og_first_occurrence_wins_case_insensitive():
    r = _one('<meta property="OG:TITLE" content="First">'
             '<meta property="og:title" content="Second">')
    assert r["og_title"] == "First"


def test_ldjson_valid_and_type_list():
    r = _one('<script type="application/ld+json">'
             '{"@type": ["Product", "Thing"], "name": "Widget"}</script>')
    assert r["n_ldjson"] == 1
    assert r["ld_types"] == "Product"
    assert r["ld_name"] == "Widget"


def test_ldjson_malformed_and_wrong_type_not_counted():
    r = _one('<script type="application/ld+json">{oops</script>'
             '<script type="text/javascript">{"@type": "X"}</script>')
    assert r["n_ldjson"] == 0 and r["ld_types"] == ""


def test_ldjson_document_order_and_first_name():
    r = _one('<script type="application/ld+json">'
             '{"@type": "Article"}</script>'
             '<script type="application/ld+json">'
             '{"@type": "Person", "name": "Ada"}</script>')
    assert r["ld_types"] == "Article;Person"
    assert r["ld_name"] == "Ada"


def test_unterminated_ldjson_runs_to_eof():
    r = _one('<script type="application/ld+json">{"@type": "Movie"}')
    assert r["n_ldjson"] == 1 and r["ld_types"] == "Movie"


def test_dataset_stage(ray_session):
    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://a.example.org/"]),
        "html": pa.array([b'<meta property="og:type" content="video">'],
                         pa.binary())}))
    df = extract_structured(pages).to_pandas()
    assert df.loc[0, "og_type"] == "video" and df.loc[0, "n_ldjson"] == 0
