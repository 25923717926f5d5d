"""KenLM-binary (probing layout, format version 5) writer.

The reference consumes KenLM binaries through flashlight
(/root/reference/src/torchaudio/models/decoder/_ctc_decoder.py:50-62);
audio_tpu reads them natively (csrc/ngram_lm.cpp).  This module is the
matching writer — the equivalent of KenLM's ``build_binary probing`` — so
ARPA models can be converted once and loaded fast thereafter.  Reader and
writer share the layout documented in ngram_lm.cpp; the round-trip
(ARPA decode == binary decode) is asserted in tests/models/test_decoder_kenlm.py.
"""

from __future__ import annotations

import math
import struct

__all__ = ["build_binary_lm"]

_MAGIC = b"mmap lm http://kheafield.com/code format version 5\n\x00"


def _murmur64a(data: bytes, seed: int = 0) -> int:
    m = 0xC6A4A7935BD1E995
    r = 47
    mask = (1 << 64) - 1
    h = (seed ^ (len(data) * m)) & mask
    n8 = len(data) // 8
    for i in range(n8):
        (k,) = struct.unpack_from("<Q", data, i * 8)
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
    tail = data[n8 * 8:]
    if tail:
        k = 0
        for i, byte in enumerate(tail):
            k |= byte << (8 * i)
        h = ((h ^ k) * m) & mask
    h ^= h >> r
    h = (h * m) & mask
    h ^= h >> r
    return h


def _combine(current: int, next_id: int) -> int:
    mask = (1 << 64) - 1
    return ((current * 8978948897894561157) & mask) ^ (
        ((1 + next_id) * 17894857484156487943) & mask
    )


def _hash_ids(ids) -> int:
    h = 0
    for i in ids:
        h = _combine(h, i)
    return h


def _probing_table(entries, payload_fmt, multiplier):
    """entries: list of (key, payload-tuple).  Returns packed bytes.

    Linear probing from ``key % buckets`` with wraparound; empty key = 0
    (matching ngram_lm.cpp's reader and KenLM's util::ProbingHashTable).
    """
    buckets = max(1, math.ceil(len(entries) * multiplier)) if entries else 0
    entry_size = 8 + struct.calcsize(payload_fmt)
    table = bytearray(buckets * entry_size)
    occupied = [False] * buckets
    for key, payload in entries:
        if key == 0:
            key = 1  # 0 marks empty slots; remap (vanishingly rare)
        i = key % buckets
        while occupied[i]:
            i = (i + 1) % buckets
        struct.pack_into("<Q" + payload_fmt, table, i * entry_size, key, *payload)
        occupied[i] = True
    return bytes(table)


def _align8(b: bytes) -> bytes:
    pad = (-len(b)) % 8
    return b + b"\x00" * pad


def _parse_arpa(path):
    order = 0
    section = 0
    unigrams = {}   # word -> (prob, backoff), insertion-ordered
    higher = {}     # n -> list of (words-tuple, prob, backoff)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("ngram ") or line == "\\data\\":
                continue
            if line == "\\end\\":
                break
            if line.startswith("\\") and line.endswith("-grams:"):
                section = int(line[1:].split("-")[0])
                order = max(order, section)
                continue
            if not section:
                continue
            parts = line.split()
            prob = float(parts[0])
            words = tuple(parts[1: 1 + section])
            backoff = float(parts[1 + section]) if len(parts) > 1 + section else 0.0
            if section == 1:
                unigrams[words[0]] = (prob, backoff)
            else:
                higher.setdefault(section, []).append((words, prob, backoff))
    if order == 0:
        raise ValueError(f"{path} is not an ARPA file (no n-gram sections)")
    return order, unigrams, higher


def build_binary_lm(arpa_path: str, out_path: str, probing_multiplier: float = 1.5) -> None:
    """Convert an ARPA n-gram model to a KenLM probing-format binary.

    The audio_tpu equivalent of KenLM's ``build_binary probing in.arpa out.bin``;
    ``ctc_decoder(..., lm=out_path)`` loads the result natively.
    """
    if not (1.0 < probing_multiplier < 16.0):
        raise ValueError("probing_multiplier must be in (1, 16)")
    order, unigrams, higher = _parse_arpa(arpa_path)

    # word ids: <unk> is always 0 (KenLM convention), others by ARPA order
    if "<unk>" not in unigrams:
        # kenlm's build_binary refuses such ARPAs too (--skip_symbols aside)
        raise ValueError(
            f"{arpa_path} has no <unk> unigram; KenLM binaries require one"
        )
    words = list(unigrams.keys())
    ids = {"<unk>": 0}
    for w in words:
        if w not in ids:
            ids[w] = len(ids)
    bound = len(ids) - 1  # highest id

    counts = [len(unigrams)] + [len(higher.get(n, [])) for n in range(2, order + 1)]

    header = bytearray()
    # Sanity (88 bytes)
    header += _MAGIC + b"\x00" * (56 - len(_MAGIC))
    header += struct.pack("<fff", 0.0, 1.0, -0.5)
    header += struct.pack("<II", 1, 0xFFFFFFFF)
    header += b"\x00" * 4
    header += struct.pack("<Q", 1)
    assert len(header) == 88
    # FixedWidthParameters (20 bytes): order, multiplier, PROBING(0),
    # has_vocabulary=0 (no trailing strings), search_version=0
    header += struct.pack("<B3xfIB3xI", order, probing_multiplier, 0, 0, 0)
    header += struct.pack(f"<{order}Q", *counts)
    header = _align8(bytes(header))

    out = bytearray(header)
    # vocab: u64 version, u64 bound, probing table of (murmur(word), id)
    out += struct.pack("<QQ", 0, bound)
    # like KenLM, the literal "<unk>" string is NOT in the table: lookup
    # misses resolve to id 0 (= <unk>) on the reader side
    vocab_entries = [(_murmur64a(w.encode()), (i,)) for w, i in ids.items() if w != "<unk>"]
    out += _align8(_probing_table(vocab_entries, "I4x", probing_multiplier))
    # unigram values indexed by id: (prob, backoff) f32, bound + 1 entries
    uni = bytearray((bound + 1) * 8)
    for w, (p, b) in unigrams.items():
        struct.pack_into("<ff", uni, ids[w] * 8, p, b)
    out += _align8(bytes(uni))
    # middles + longest
    for n in range(2, order + 1):
        entries = []
        for ngram_words, p, b in higher.get(n, []):
            gid = [ids.get(w) for w in ngram_words]
            if any(g is None for g in gid):
                # n-gram over a word with no unigram: hash over a fresh id
                # space consistent with the reader's behavior — skip, the
                # reader would never look it up successfully anyway
                continue
            payload = (p,) if n == order else (p, b)
            entries.append((_hash_ids(gid), payload))
        fmt = "f4x" if n == order else "ff"
        out += _align8(_probing_table(entries, fmt, probing_multiplier))

    with open(out_path, "wb") as f:
        f.write(bytes(out))
