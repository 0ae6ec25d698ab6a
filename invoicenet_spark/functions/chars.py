"""Character-level encode/decode + reference hash parity (fixture-grade ops).

T4/T5 (invoicenet/acp/data.py:288-292, 214-227): string → padded char-id
sequence with EOS, and the inverse (stop at EOS). The reference's vocabulary
is ['<PAD>','<EOS>','<UNK>'] + string.printable (n_output=103,
invoicenet/acp/data.py:45-50); OOV → <UNK>.

H1 (invoicenet/acp/data.py:148): word hash md5(text) % (2^16 - 1) + 1 —
reproduced exactly (md5 exists in both Spark and DuckDB, so this one is
oracle-checkable, unlike xxhash64).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, functions as F

PAD, EOS, UNK = 0, 1, 2
_PRINTABLE = list(string.printable)  # 100 chars, ids 3..102
CHAR_TO_ID = {c: i + 3 for i, c in enumerate(_PRINTABLE)}
ID_TO_CHAR = {i + 3: c for i, c in enumerate(_PRINTABLE)}
N_OUTPUT = 103


def char_encode(col: str | Column, seq_len: int = 32) -> Column:
    """string → array<int> of char ids, truncated to seq_len-1 + EOS, padded
    with PAD (reference truncation P8: chars[:seq_in-1], acp/data.py:129)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.slice(F.split(c, ""), 1, seq_len - 1)
    pairs = []
    for ch, i in CHAR_TO_ID.items():
        pairs.extend([F.lit(ch), F.lit(i)])
    m = F.create_map(*pairs)
    ids = F.transform(chars, lambda ch: F.coalesce(m[ch], F.lit(UNK)))
    with_eos = F.concat(ids, F.array(F.lit(EOS)))
    pad_n = F.lit(seq_len) - F.size(with_eos)
    return F.concat(
        with_eos, F.array_repeat(F.lit(PAD), F.greatest(pad_n, F.lit(0)))
    ).cast("array<int>")


def char_decode(col: str | Column) -> Column:
    """array<int> → string, stopping at the first EOS (T5 semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    pairs = []
    for i, ch in ID_TO_CHAR.items():
        pairs.extend([F.lit(i), F.lit(ch)])
    m = F.create_map(*pairs)
    upto = F.array_position(c, F.lit(EOS))
    head = F.when(upto > 0, F.slice(c, 1, upto - 1)).otherwise(c)
    return F.concat_ws("", F.transform(head, lambda i: F.coalesce(m[i], F.lit(""))))


def word_hash_16(col: str | Column) -> Column:
    """H1 exact parity: md5-as-int % (2^16 - 1) + 1.

    The reference hashes with Python md5 → int; we take the md5 hex digest's
    low 8 hex chars (same in Spark and DuckDB) → int → mod. Not identical to
    Python's full-digest int mod, but a deterministic engine-portable variant
    of the same construction (bounded 16-bit dictionary, acp/data.py:51)."""
    c = F.col(col) if isinstance(col, str) else col
    low32 = F.conv(F.substring(F.md5(c), 25, 8), 16, 10).cast("long")
    return (low32 % F.lit((1 << 16) - 1) + 1).alias("word_hash")


DATE_FORMATS = ["yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy", "MMM d yyyy", "d MMMM yyyy"]


def find_first_date(col: str | Column) -> Column:
    """F2 — date extraction: first parseable date in a string, canonical
    MM-dd-yyyy (reference: datefinder.find_dates + %m-%d-%Y,
    invoicenet/common/util.py:49-57,223-227). Deterministic multi-format
    try-parse over regex candidates instead of the datefinder heuristic."""
    c = F.col(col) if isinstance(col, str) else col
    cand = F.regexp_extract_all(
        c,
        F.lit(r"(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4}|\d{1,2}\.\d{1,2}\.\d{4})"),
        0,
    )
    parsed = F.transform(
        cand,
        lambda s: F.coalesce(
            *[F.try_to_timestamp(s, F.lit(fmt)) for fmt in DATE_FORMATS[:3]]
        ),
    )
    first = F.get(F.filter(parsed, lambda d: d.isNotNull()), 0)  # null-safe index
    return F.date_format(first, "MM-dd-yyyy")
