"""Vectorized FASTA k-mer tokenization (bit-exactness suite).

Re-expresses the reference's streaming char-at-a-time tokenizer
(reference: include/ocm.h:526-584 ``update_from_file``, :471-491
``addChar``, :493-523 ``reverse_compliment``) as numpy array kernels.
Semantics reproduced exactly:

- ``>`` starts a header line (skipped to newline) and resets the window;
- whitespace is skipped without resetting;
- ``N`` resets the rolling window;
- 2-bit alphabet A=00, T=01, G=10, C=11;
- one k-mer emitted per window position once the window is full;
- canonicalize=True additionally emits the reverse complement of every
  window (complement == 2-bit code XOR 1, order reversed).

This module exists so the Spark sketch kernels can be validated
bit-for-bit against golden sketch files produced by the reference
binaries (see tests/fixtures/). The production tokenizer for
conversation transcripts lives in sketchlib/tokenize.py.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

# char -> 2-bit code; 255 = window reset (N or anything unknown)
_CODE = np.full(256, 255, dtype=np.uint8)
_CODE[ord("A")] = 0
_CODE[ord("T")] = 1
_CODE[ord("G")] = 2
_CODE[ord("C")] = 3


def read_fasta_sequences(path: str) -> list[str]:
    """Parse a FASTA file into per-record sequence strings (headers
    reset the window in the reference, so records are independent)."""
    seqs: list[str] = []
    cur: list[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line)
    if cur:
        seqs.append("".join(cur))
    return seqs


def _run_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """k-mers of one N-free code run, one per window position (uint64)."""
    n = codes.shape[0]
    if n < k:
        return np.empty(0, dtype=_U64)
    windows = np.lib.stride_tricks.sliding_window_view(codes, k).astype(_U64)
    shifts = (_U64(2) * np.arange(k - 1, -1, -1, dtype=_U64))  # big-endian first char
    return (windows << shifts[None, :]).sum(axis=1, dtype=_U64)


def _run_rc_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """Reverse-complement k-mers: complement = code ^ 1, order reversed."""
    n = codes.shape[0]
    if n < k:
        return np.empty(0, dtype=_U64)
    comp = (codes ^ 1).astype(_U64)
    windows = np.lib.stride_tricks.sliding_window_view(comp, k)
    shifts = (_U64(2) * np.arange(k, dtype=_U64))  # reversed order
    return (windows << shifts[None, :]).sum(axis=1, dtype=_U64)


def sequence_kmers(seq: str, k: int, canonicalize: bool = True) -> np.ndarray:
    """Emit the exact k-mer stream the reference inserts for one sequence,
    in reference order: per window position, forward k-mer then (if
    canonicalize) its reverse complement (include/ocm.h:576-579)."""
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    codes = _CODE[raw]
    # split into N-free runs; whitespace never reaches here (joined lines)
    bad = np.flatnonzero(codes == 255)
    bounds = np.concatenate(([-1], bad, [codes.shape[0]]))
    out: list[np.ndarray] = []
    for s, e in zip(bounds[:-1] + 1, bounds[1:]):
        run = codes[s:e]
        if run.shape[0] < k:
            continue
        fwd = _run_kmers(run, k)
        if canonicalize:
            rc = _run_rc_kmers(run, k)
            inter = np.empty(fwd.shape[0] * 2, dtype=_U64)
            inter[0::2] = fwd
            inter[1::2] = rc
            out.append(inter)
        else:
            out.append(fwd)
    if not out:
        return np.empty(0, dtype=_U64)
    return np.concatenate(out)


def file_kmers(path: str, k: int, canonicalize: bool = True) -> np.ndarray:
    """Full insertion stream for a FASTA file, reference order."""
    chunks = [sequence_kmers(s, k, canonicalize) for s in read_fasta_sequences(path)]
    chunks = [c for c in chunks if c.size]
    if not chunks:
        return np.empty(0, dtype=_U64)
    return np.concatenate(chunks)


def encode_kmer(kmer: str) -> int:
    """Forward 2-bit encoding of a k-mer string (query side; the
    reference queries forward-strand only and silently *skips* any
    non-ACGT character without shifting, main.cpp:138-167)."""
    v = 0
    for ch in kmer:
        code = _CODE[ord(ch)]
        if code != 255:
            v = (v << 2) | int(code)
    return v
