"""Streamlit web client (``src/webui.py``).

Posts to the HTTP API and renders the answer plus expandable context docs.
Streamlit is not in this image; the module degrades to a tiny terminal
client so the surface still exists.

Run:  streamlit run easyrag_tpu/serving/webui.py      (with streamlit)
      python -m easyrag_tpu.serving.webui --query ... (fallback client)
"""

from __future__ import annotations

import json
import urllib.request

API_URL = "http://127.0.0.1:8000/v1/rag"
DOCUMENT_CHOICES = ["无", "director", "emsplus", "rcp", "umac"]


def ask(query: str, document: str = "", api_url: str = API_URL) -> dict:
    payload = json.dumps(
        {"query": query, "document": "" if document == "无" else document}
    ).encode("utf-8")
    req = urllib.request.Request(
        api_url, data=payload, headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read().decode("utf-8"))


def streamlit_app() -> None:  # pragma: no cover - needs streamlit runtime
    import streamlit as st

    st.title("EasyRAG-TPU 问答")
    with st.form("ask"):
        query = st.text_area("问题")
        document = st.selectbox("文档来源", DOCUMENT_CHOICES)
        submitted = st.form_submit_button("提问")
    if submitted and query:
        res = ask(query, document)
        st.markdown(res["answer"])
        for i, ctx in enumerate(res.get("contexts", [])):
            with st.expander(f"文档{i}"):
                st.text(ctx)


def _main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--query", required=True)
    parser.add_argument("--document", default="")
    parser.add_argument("--api-url", default=API_URL)
    args = parser.parse_args()
    res = ask(args.query, args.document, args.api_url)
    print(res["answer"])
    for i, ctx in enumerate(res.get("contexts", [])):
        print(f"\n### 文档{i}\n{ctx[:500]}")


try:  # streamlit execs this file top-level
    import streamlit  # noqa: F401

    _HAS_STREAMLIT = True
except ImportError:
    _HAS_STREAMLIT = False

if _HAS_STREAMLIT and __name__ != "__main__":  # pragma: no cover
    streamlit_app()

if __name__ == "__main__":
    _main()
