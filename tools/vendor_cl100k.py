"""Fetch the cl100k_base BPE table and vendor it into the package.

Run once on a machine WITH network access:

    python tools/vendor_cl100k.py

This writes ``easyrag_tpu/data/cl100k_base.tiktoken`` (~1.7 MB). With the
file present, the splitter's token counter is byte-identical to
llama-index's default (the reference's chunk-size measure) on zero-egress
hosts — see ``easyrag_tpu/corpus/tokenizer.py::default_token_counter``.
"""

import hashlib
import os
import sys
import urllib.request

URL = "https://openaipublic.blob.core.windows.net/encodings/cl100k_base.tiktoken"
SHA256 = "223921b76ee99bde995b7ff738513eef100fb51d18c93f01200f28ffc057794c"
DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "easyrag_tpu",
    "data",
    "cl100k_base.tiktoken",
)


def main() -> int:
    print(f"fetching {URL} ...")
    data = urllib.request.urlopen(URL, timeout=60).read()
    digest = hashlib.sha256(data).hexdigest()
    if digest != SHA256:
        print(f"sha256 mismatch: got {digest}, want {SHA256}", file=sys.stderr)
        return 1
    with open(DEST, "wb") as f:
        f.write(data)
    print(f"wrote {DEST} ({len(data)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
