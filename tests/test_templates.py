"""DOM template fingerprints: invariance to text/attrs, sensitivity to
structure, lenient recovery, cluster stats."""

import pyarrow as pa
import ray.data as rd

from xtract.ops.templates import (page_templates, template_fp_one,
                                  template_host_stats)


def test_text_and_attrs_do_not_change_fp():
    a = template_fp_one(b"<html><body><div class='x'><p>one</p></div>"
                        b"</body></html>")
    b = template_fp_one(b"<html><body><div id='y' data-k=9><p>totally "
                        b"different words</p></div></body></html>")
    assert a == b


def test_structure_changes_fp():
    a = template_fp_one(b"<div><p>t</p></div>")
    b = template_fp_one(b"<div><p>t</p><p>t</p></div>")
    c = template_fp_one(b"<div><span>t</span></div>")
    assert len({a, b, c}) == 3


def test_void_and_selfclose_do_not_desync_stack():
    # br/img are void: following siblings stay at the same depth
    a = template_fp_one(b"<div><br><p>x</p></div>")
    b = template_fp_one(b"<div><br/><p>x</p></div>")
    assert a == b
    # an unclosed void would otherwise shift the p path one deeper
    c = template_fp_one(b"<div><span><p>x</p></span></div>")
    assert a != c


def test_stray_end_tags_ignored():
    a = template_fp_one(b"<div></b><p>x</p></div>")
    b = template_fp_one(b"<div><p>x</p></div>")
    assert a == b


def test_comments_and_decls_ignored():
    a = template_fp_one(b"<!doctype html><div><!-- hi --><p>x</p></div>")
    b = template_fp_one(b"<div><p>x</p></div>")
    assert a == b


def test_host_stats(ray_session):
    rows = []
    for i in range(12):
        tpl = ("<div><p>a%d</p></div>" if i % 2 == 0
               else "<table><tr><td>b%d</td></tr></table>") % i
        rows.append({"url": f"https://h{i % 2}.org/p/{i}",
                     "html": f"<html><body>{tpl}</body></html>".encode()})
    ds = rd.from_items(rows)
    out = template_host_stats(page_templates(ds)).to_pandas()
    out = out.sort_values("host").reset_index(drop=True)
    # even i -> h0 with template A only; odd i -> h1 with template B only
    assert out["host"].tolist() == ["h0.org", "h1.org"]
    assert out["n_pages"].tolist() == [6, 6]
    assert out["n_templates"].tolist() == [1, 1]
    assert out["top_template_pages"].tolist() == [6, 6]
