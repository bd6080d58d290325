"""zedx preprocessing: nodetree walk, HTML conversion, figure harvest,
text cleanup, OCR filter flow."""

import json
import os

from easyrag_tpu.corpus.html_text import html_to_text
from easyrag_tpu.corpus.ocr import contains_chinese, filter_imgmap
from easyrag_tpu.corpus.zedx import clean_text, preprocess_zedx

NODETREE = """<nodetree>
  <node name="运维指南" url="guide/index.html">
    <node name="扩容" url="guide/scale.html"/>
  </node>
</nodetree>"""

SCALE_HTML = """<html><body>
<h1>扩容指南</h1>
<p>支持 <span class="xref gxref" title="Service Controller--服务控制器">SC</span> 扩容。</p>
<p>组网如图1所示。</p>
<figure class="fig fig_ fignone"><span>图1</span>
  <figcaption><span>图1</span> 扩容组网示意</figcaption>
  <img src="images/fig1%20a.png"/>
</figure>
<table><tr><th>虚机</th><th>最大个数</th></tr>
<tr><td>CDU</td><td>15</td></tr></table>
</body></html>"""

INDEX_HTML = "<html><body><p>目录</p><p>目录</p></body></html>"


def _build_package(tmp_path):
    meta = tmp_path / "origin" / "director"
    docs = meta / "documents" / "guide"
    (docs / "images").mkdir(parents=True)
    (docs / "images" / "fig1 a.png").write_bytes(b"fake")
    (meta / "nodetree.xml").write_text(NODETREE, encoding="utf-8")
    (docs / "index.html").write_text(INDEX_HTML, encoding="utf-8")
    (docs / "scale.html").write_text(SCALE_HTML, encoding="utf-8")
    return str(tmp_path / "origin"), str(tmp_path / "out")


def test_preprocess_zedx_end_to_end(tmp_path):
    meta_root, out_root = _build_package(tmp_path)
    pathmap, imgmap = preprocess_zedx(meta_root, out_root, packages=["director"])

    # pathmap keys are package-relative txt paths -> knowledge path tuples
    assert pathmap["director/guide/scale.txt"] == ["director", "运维指南", "扩容"]
    txt = open(
        os.path.join(out_root, "director", "guide", "scale.txt"), encoding="utf-8"
    ).read()
    # abbreviation expanded inline
    assert "SC(Service Controller, 服务控制器)" in txt
    # markdown table with separator row (embed_type=6 depends on this)
    assert "| 虚机 | 最大个数 |" in txt and "| --- | --- |" in txt
    assert "| CDU | 15 |" in txt
    # heading preserved
    assert "# 扩容指南" in txt

    # figure harvested with unquoted path and span-stripped title
    fig = imgmap["director/guide/scale.txt"]["图1"]
    assert fig["img_path"] == os.path.join("director", "guide", "images/fig1 a.png")
    assert fig["title"] == "扩容组网示意"
    # images dir copied next to the text tree
    assert os.path.exists(os.path.join(out_root, "director", "guide", "images"))
    # artifacts written
    assert os.path.exists(os.path.join(out_root, "pathmap.json"))
    assert os.path.exists(os.path.join(out_root, "imgmap_raw.json"))


def test_clean_text_rules():
    raw = "line1\nline1\n\nhtml junk\n  spaced  \n"
    out = clean_text(raw, ["pkg", "a"], with_path=True)
    assert out.startswith("###\n文档路径: pkg/a\n\n")
    assert out.count("line1") == 1
    assert "html junk" not in out
    assert "spaced" in out
    assert clean_text("", ["p"], with_path=False) == "<文档为空>\n"


def test_html_to_text_lists_and_links():
    html = '<ul><li>第一项</li><li>第二项 <a href="x">链接文字</a></li></ul>'
    text = html_to_text(html)
    assert "* 第一项" in text
    assert "* 第二项 链接文字" in text
    assert "href" not in text and "x" not in text.split("链接文字")[1]


def test_ocr_filter_flow(tmp_path):
    imgmap = {
        "director/a.txt": {
            "图1": {"img_path": "director/one.png", "title": "t1"},
            "图2": {"img_path": "director/two.png", "title": "t2"},
            "图3": {"img_path": "director/three.png", "title": "t3",
                    "content": "已有中文内容"},
        }
    }
    raw_path = tmp_path / "imgmap_raw.json"
    raw_path.write_text(json.dumps(imgmap), encoding="utf-8")

    def fake_ocr(path):
        return "中文文字" if "one" in path else "english only"

    captions = []

    def fake_caption(path):
        captions.append(path)
        if "three" in path:
            raise RuntimeError("caption fail")  # kept without new content
        return f"描述:{os.path.basename(path)}"

    out = filter_imgmap(
        str(raw_path), str(tmp_path), out_path=str(tmp_path / "filtered.json"),
        ocr_fn=fake_ocr, caption_fn=fake_caption,
    )
    kept = out["director/a.txt"]
    assert set(kept) == {"图1", "图3"}  # 图2 dropped: no Chinese OCR
    assert kept["图1"]["content"] == "描述:one.png"
    assert kept["图3"]["content"] == "已有中文内容"  # caption failed, original kept
    assert contains_chinese("中文") and not contains_chinese("abc")
