"""Pure-Python BPE merge-table reference (no Spark) — the single-process
oracle for operators/bpe.py, shared by tests/make_bpe_golden.py (committed
golden parquet, digest-selected in static SQL) and the live parity pytest.

Spec (frozen — both engines implement THIS, not a library):
- corpus = word frequency table over the kernel tokenizer's lowered tokens
  (textutils.tokenize, then str.lower per token — identical to the Spark
  side's lower(tidy) split);
- a word's initial symbol sequence is its characters (no end-of-word
  marker);
- each step counts ADJACENT symbol pairs weighted by word frequency,
  picks the pair with the highest count — ties broken by lexicographically
  smallest (left, right) — and merges it LEFT-TO-RIGHT NON-OVERLAPPING in
  every word ("aaa" + merge (a,a) → [aa, a]);
- stops after ``k`` merges or when no pair remains.
"""

from __future__ import annotations

from .textutils import tokenize

BPE_MERGES = 8


def word_freqs(texts: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in texts:
        for w in tokenize(t or ""):
            w = w.lower()
            out[w] = out.get(w, 0) + 1
    return out


def _merge_seq(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge — the exact carry fold the
    Spark operator runs (F.aggregate): a consumed pair cannot re-merge
    with the following symbol in the same step."""
    res: list[str] = []
    carry: str | None = None
    for s in syms:
        if carry is None:
            carry = s
        elif carry == left and s == right:
            res.append(left + right)
            carry = None
        else:
            res.append(carry)
            carry = s
    if carry is not None:
        res.append(carry)
    return res


def bpe_merges_reference(
    freqs: dict[str, int], k: int = BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Returns [(step, lhs, rhs, merged, pair_count)] — at most ``k`` rows."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in freqs.items() if w
    ]
    out: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best_count = max(counts.values())
        lhs, rhs = min(p for p, c in counts.items() if c == best_count)
        out.append((step, lhs, rhs, lhs + rhs, best_count))
        seqs = [(_merge_seq(s, lhs, rhs), f) for s, f in seqs]
    return out
