"""Unicode-adversarial twin of the driver testdata.

Appends documents rows whose text exercises the string-function
surface where JVM (Spark UTF8String) and utf8proc (DuckDB) have
historically diverged: locale-sensitive case folding (Turkish
dotted/dotless I, German sharp-s, Greek final sigma), combining
marks, emoji + ZWJ sequences, CJK (no word boundaries), RTL scripts,
zero-width/control characters, and a 10k-codepoint single token.
Every text-pipeline oracle pair (lower(), regex tokenization,
length(), md5 fingerprints, substring windows) must agree on these
BEFORE a multilingual corpus does it in production.

n_chars mirrors Python len(text) (codepoints) — the convention both
engines' length() uses on UTF-8.

Usage: python tools/make_unicode_testdata.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /root/repo/testdata_unicode
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_LONG_TOKEN = "é" * 10_000  # 10k combining-free é, ONE token

UNICODE_TEXTS = [
    # Turkish dotted capital I and dotless i: lower('İ') is the classic
    # JVM-vs-utf8proc divergence (locale-sensitive in java.lang.String)
    "İstanbul ve ILGIN iı Iİ words here",
    # German sharp-s and its capital form
    "straße STRASSE ẞ groß words",
    # Greek with final sigma (case-folds to non-final sigma)
    "Σοφός σοφός ΣΑΣ words",
    # combining marks: e + U+0301 vs precomposed é (NOT normalized)
    "café café déjà words here",
    # emoji, ZWJ family sequence, skin-tone modifier, flags
    "hello \U0001f600 \U0001f469‍\U0001f469‍\U0001f467 \U0001f44d\U0001f3fd \U0001f1e9\U0001f1ea world",
    # CJK: no spaces, no [a-z0-9] tokens at all
    "漢字テスト한국어中文測試",
    # RTL Arabic + Hebrew with LTR digits embedded
    "مرحبا 123 שלום 456",
    # zero-width space / joiner / non-joiner / BOM inside words
    "zero​width zero‌join zero‍join ﻿bom words",
    # control chars and unusual whitespace (NBSP, thin space, tab)
    "tab\there nbsp word thin space\x01ctl words",
    # one enormous single token (regex/token-length stress)
    _LONG_TOKEN,
]


def _unicode_docs(schema: pa.Schema) -> pa.Table:
    rows = [
        (70_000_000 + i, text, "xx", "unicode", len(text))
        for i, text in enumerate(UNICODE_TEXTS)
    ]
    cols = list(zip(*rows))
    names = [f.name for f in schema]
    # column order in the synthetic table: doc_id, text, lang, source, n_chars
    by_name = {
        "doc_id": cols[0], "text": cols[1], "lang": cols[2],
        "source": cols[3], "n_chars": cols[4],
    }
    return pa.table(
        {f.name: pa.array(by_name[f.name], type=f.type) for f in schema},
        schema=schema,
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_unicode"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        out_path = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            base = pq.read_table(src_path)
            pq.write_table(
                pa.concat_tables([base, _unicode_docs(base.schema)]),
                out_path,
            )
        else:
            shutil.copyfile(src_path, out_path)
        print(f"{t}: {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
