#!/usr/bin/env python3
"""Generate the sha1-id parity fixture for Sha1ParitySpec.

Replicates the reference's composite-id functions INDEPENDENTLY of the
Scala implementation (hashlib + the exact loop shapes of
/root/reference/etl/reviews_jsonl.py:39-46, etl/airbnb/reviews_jsonl.py:10-16
and etl/reviews.py:32-36) so the spec pins byte-level parity:

  - _sha1_id: every part utf-8 encoded then b"\\x1f", INCLUDING the last;
    None -> ""
  - _hash_id: every part str(p) + "|", including the last (no None guard:
    None -> "None")
  - call-site shapes: yelp/reddit `src:{_sha1_id(pid, ts, text[:512])}` on
    CRLF/CR->LF normalized text; airbnb `_sha1_id("airbnb", lid, date,
    uid, text[:256])`; reviews.py `src:{_hash_id(pid, ts, text[:120])}`.

Output: src/test/resources/sha1_fixture.json (committed).
"""
import hashlib
import json
from pathlib import Path


def sha1_id(*parts):
    h = hashlib.sha1()
    for p in parts:
        if p is None:
            p = ""
        h.update(str(p).encode("utf-8"))
        h.update(b"\x1f")
    return h.hexdigest()


def hash_id(*parts):
    h = hashlib.sha1()
    for p in parts:
        h.update((str(p) + "|").encode("utf-8"))
    return h.hexdigest()


def normalize_text(s):
    if s is None:
        return ""
    return str(s).replace("\r\n", "\n").replace("\r", "\n")


# raw (part-list -> digest) pins for the two primitives
RAW_SHA1 = [
    ["a", "b", "c"],
    [""],
    ["", ""],
    [None],
    ["yelp:abc123", None, "some text"],
    ["café", "straße", "札幌"],
    ["multi\nline", "tab\there"],
    ["\U0001f680 rocket", "\U0001f9e0"],
    ["edge\x1finside"],  # a part containing the separator byte itself
    ["123", "45.0", "True"],
]
RAW_PIPE = [
    ["a", "b", "c"],
    ["biz-1", "2024-01-02T03:04:05", "short review"],
    ["p|with|pipes", "", "x"],
    [None, "ts", "t"],  # None -> "None" in this variant
]

# call-site shapes: (source, place_id, scraped_at, raw_text)
REVIEW_CASES = [
    ["yelp", "yelp:b1", "2024-05-06 07:08:09", "Great place!\r\nWould return."],
    ["reddit", "reddit:t3_x", "2024-01-01", "line1\rline2\r\nline3"],
    ["yelp", "yelp:b2", "", "x" * 600],                      # past the 512 cap
    ["yelp", "yelp:b3", "ts", "é" * 510 + "\U0001f680" * 8],  # non-BMP at cap
    ["reddit", "reddit:t3_y", "ts", None],
]
AIRBNB_CASES = [
    ["lst-1", "2024-02-03", "rev-9", "Lovely flat\r\ngreat host"],
    ["lst-2", "2024-02-04", "rev-10", "b" * 300],            # past the 256 cap
]
PIPE_CASES = [
    ["yelp", "b-77", "2023-12-31", "Tiny review"],
    ["reddit", "poi-3", "", "y" * 200],                      # past the 120 cap
]

out = {
    "raw_sha1": [
        {"parts": p, "digest": sha1_id(*p)} for p in RAW_SHA1
    ],
    "raw_pipe": [
        {"parts": p, "digest": hash_id(*p)} for p in RAW_PIPE
    ],
    "review_id": [
        {"source": s, "place_id": pid, "scraped_at": ts, "text": t,
         "id": f"{s}:{sha1_id(pid, ts, str(normalize_text(t))[:512])}"}
        for s, pid, ts, t in REVIEW_CASES
    ],
    "airbnb_id": [
        {"listing_id": lid, "date": d, "reviewer_id": uid, "text": t,
         "id": sha1_id("airbnb", lid, d, uid, str(normalize_text(t))[:256])}
        for lid, d, uid, t in AIRBNB_CASES
    ],
    "pipe_id": [
        {"source": s, "place_id": pid, "scraped_at": ts, "text": t,
         "id": f"{s}:{hash_id(pid, ts, (t or '')[:120])}"}
        for s, pid, ts, t in PIPE_CASES
    ],
}

dest = Path(__file__).resolve().parent.parent / "src/test/resources/sha1_fixture.json"
dest.parent.mkdir(parents=True, exist_ok=True)
dest.write_text(json.dumps(out, ensure_ascii=False, indent=1) + "\n",
                encoding="utf-8")
print(f"wrote {dest}")
