#!/usr/bin/env python
"""Recover real BPE vocabulary entries from gold (tokens, text) pairs.

The reference ships gold transcription artifacts whose segments carry both
real large-v3 token ids and the text they decode to (/root/reference/30m.json,
SURVEY.md §6). No tiktoken ranks file can be downloaded in this environment,
but each segment is a concatenation equation

    decode(t_1) + decode(t_2) + ... + decode(t_k) = utf8(text)

over the unknown per-token byte strings. This solver recovers the uniquely
determined entries:

  1. seed: ids 0-255 are the byte-level BPE base alphabet in GPT-2's
     byte-to-unicode order (the convention Whisper's vocab follows; the
     solver VALIDATES this — any wrong seed contradicts some equation);
  2. fixpoint of prefix/suffix stripping with known values;
  3. per-equation feasibility DP producing candidate sets per unknown
     token, intersected across all equations containing that token;
  4. structural pruning from BPE pre-tokenization (no interior whitespace;
     a piece can't mix letters/digits/punctuation) and vocab injectivity.

Every learned entry is exact — a token is only pinned when a single value
is consistent with ALL equations simultaneously. On the 30 min gold file
this recovers ~1.1k of the 1.2k distinct text tokens and makes ~90% of the
743 segments decode byte-for-byte.

Usage:
    python tools/gold_vocab_solver.py GOLD_JSON -o OUT_JSON
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List, Optional, Set, Tuple

MAXLEN = 24  # longest candidate byte string considered
TEXT_TOKEN_LIMIT = 50257  # ids >= this are special/timestamp tokens


def id_of_byte(b: int) -> int:
    """Vocab id of the single-byte token for byte ``b`` (GPT-2
    bytes-to-unicode ordering: printable ASCII first, then the Latin-1
    blocks, then the remapped control bytes)."""
    if 33 <= b <= 126:
        return b - 33
    if 161 <= b <= 172:
        return 94 + (b - 161)
    if 174 <= b <= 255:
        return 106 + (b - 174)
    if 0 <= b <= 32:
        return 188 + b
    if 127 <= b <= 160:
        return 221 + (b - 127)
    return 255  # b == 173


def byte_alphabet() -> Dict[int, bytes]:
    return {id_of_byte(b): bytes([b]) for b in range(256)}


def plausible(v: bytes) -> bool:
    """Can ``v`` be a BPE piece? Pieces are substrings of one pre-token
    unit (" ?letters", " ?digits", " ?punct-run", whitespace runs,
    contractions), so interior whitespace and category mixing are
    impossible."""
    if not v or len(v) > MAXLEN:
        return False
    if all(c in b" \t\n" for c in v):
        return True
    core = v.lstrip(b" ")
    if b" " in core or b"\n" in core:
        return False
    try:
        s = core.decode("utf-8")
    except UnicodeDecodeError:
        return True  # partial UTF-8 sequence: can't categorize
    if s.startswith("'"):
        s = s[1:]
        if not s:
            return True
    has_alpha = any(c.isalpha() for c in s)
    has_digit = any(c.isdigit() for c in s)
    has_other = any(not c.isalnum() for c in s)
    return (has_alpha + has_digit + has_other) <= 1


class GoldVocabSolver:
    def __init__(self, equations: List[Tuple[List[int], bytes]]):
        self.eqs = [(list(t), d) for t, d in equations if t]
        self.known: Dict[int, bytes] = byte_alphabet()
        self.cand: Dict[int, Set[bytes]] = {}

    # -- core passes -------------------------------------------------------

    def _reduce(self, toks: List[int], data: bytes):
        toks = list(toks)
        while toks and toks[0] in self.known:
            b = self.known[toks[0]]
            if data[: len(b)] != b:
                raise ValueError(f"prefix contradiction at token {toks[0]}")
            data = data[len(b):]
            toks.pop(0)
        while toks and toks[-1] in self.known:
            b = self.known[toks[-1]]
            if data[len(data) - len(b):] != b:
                raise ValueError(f"suffix contradiction at token {toks[-1]}")
            data = data[: len(data) - len(b)]
            toks.pop()
        return toks, data

    def _eq_candidates(
        self, toks: List[int], data: bytes
    ) -> Optional[Dict[int, Set[bytes]]]:
        """Forward/backward feasibility DP over split positions."""
        k, n = len(toks), len(data)
        fwd: List[Set[int]] = [set() for _ in range(k + 1)]
        fwd[0].add(0)
        for i, t in enumerate(toks):
            for p in fwd[i]:
                if t in self.known:
                    b = self.known[t]
                    if data[p : p + len(b)] == b:
                        fwd[i + 1].add(p + len(b))
                else:
                    cs = self.cand.get(t)
                    for q in range(p + 1, min(n, p + MAXLEN) + 1):
                        v = data[p:q]
                        if (cs is not None and v not in cs) or (
                            cs is None and not plausible(v)
                        ):
                            continue
                        fwd[i + 1].add(q)
        if n not in fwd[k]:
            return None
        bwd: List[Set[int]] = [set() for _ in range(k + 1)]
        bwd[k].add(n)
        for i in range(k - 1, -1, -1):
            t = toks[i]
            for q in bwd[i + 1]:
                if t in self.known:
                    b = self.known[t]
                    if q >= len(b) and data[q - len(b) : q] == b:
                        bwd[i].add(q - len(b))
                else:
                    cs = self.cand.get(t)
                    for p in range(max(0, q - MAXLEN), q):
                        v = data[p:q]
                        if (cs is not None and v not in cs) or (
                            cs is None and not plausible(v)
                        ):
                            continue
                        bwd[i].add(p)
        out: Dict[int, Set[bytes]] = {}
        for i, t in enumerate(toks):
            if t in self.known:
                continue
            cs = self.cand.get(t)
            vals = set()
            for p in fwd[i]:
                for q in bwd[i + 1]:
                    if q <= p or q - p > MAXLEN:
                        continue
                    v = data[p:q]
                    if (cs is not None and v not in cs) or (
                        cs is None and not plausible(v)
                    ):
                        continue
                    vals.add(v)
            if t in out:
                out[t] |= vals
            else:
                out[t] = vals
        return out

    def solve(self, max_sweeps: int = 30) -> Dict[int, bytes]:
        for _ in range(max_sweeps):
            changed = False
            for toks, data in self.eqs:
                t2, d2 = self._reduce(toks, data)
                if len(t2) == 1 and t2[0] not in self.known:
                    if not d2:
                        raise ValueError(f"empty value for token {t2[0]}")
                    self.known[t2[0]] = d2
                    changed = True
                elif not t2 and d2:
                    raise ValueError(f"leftover bytes {d2!r}")
            for toks, data in self.eqs:
                t2, d2 = self._reduce(toks, data)
                if not t2:
                    continue
                res = self._eq_candidates(t2, d2)
                if res is None:
                    raise ValueError(f"infeasible equation {t2} = {d2!r}")
                for t, vals in res.items():
                    old = self.cand.get(t)
                    new = vals if old is None else (old & vals)
                    if not new:
                        raise ValueError(f"no candidate left for token {t}")
                    if new != old:
                        self.cand[t] = new
                        changed = True
                    if len(new) == 1 and t not in self.known:
                        self.known[t] = next(iter(new))
                        changed = True
            # injectivity: the vocab is a bijection
            taken = set(self.known.values())
            for t, vals in list(self.cand.items()):
                if t in self.known:
                    continue
                new = {v for v in vals if v not in taken}
                if not new:
                    raise ValueError(f"injectivity emptied token {t}")
                if new != vals:
                    self.cand[t] = new
                    changed = True
                    if len(new) == 1:
                        self.known[t] = next(iter(new))
            if not changed:
                break
        return self.known

    # -- trial refinement --------------------------------------------------

    def _consistent_under(self, token: int, value: bytes, sweeps: int = 6) -> bool:
        """Does assigning ``token := value`` admit a contradiction-free
        propagation? (joint consistency probe for refine_by_trial)"""
        clone = GoldVocabSolver.__new__(GoldVocabSolver)
        clone.eqs = self.eqs
        clone.known = dict(self.known)
        clone.cand = {t: set(v) for t, v in self.cand.items()}
        clone.known[token] = value
        clone.cand.pop(token, None)
        try:
            clone.solve(max_sweeps=sweeps)
        except ValueError:
            return False
        return True

    def refine_by_trial(self, max_branch: int = 12, rounds: int = 4) -> int:
        """Branch-and-prune: for each still-ambiguous token, TRY each
        surviving candidate and drop the ones whose assignment contradicts
        some equation under propagation. Candidates that survive every
        per-equation intersection can still be jointly inconsistent with
        other tokens' constraints — this pass is what separates
        'insufficient equations' from genuine ambiguity, and resolves any
        token left with a single jointly-consistent value.

        Returns the number of newly-resolved tokens."""
        resolved = 0
        for _ in range(rounds):
            changed = False
            for t in sorted(self.cand):
                if t in self.known:
                    continue
                vals = self.cand[t]
                if len(vals) > max_branch:
                    continue
                keep = {v for v in sorted(vals) if self._consistent_under(t, v)}
                if not keep:
                    # every candidate fails joint propagation — leave the
                    # per-equation set rather than corrupting state
                    continue
                if keep != vals:
                    self.cand[t] = keep
                    changed = True
                if len(keep) == 1:
                    self.known[t] = next(iter(keep))
                    resolved += 1
                    self.solve(max_sweeps=4)  # propagate the new fact
            if not changed:
                break
        return resolved

    # -- reporting ---------------------------------------------------------

    def maximality_report(self) -> dict:
        """Per-undecoded-segment accounting of WHY it stays undecoded.

        Every unresolved token is classified:
          - ``ambiguous``: >= 2 byte values each jointly consistent with
            ALL equations under propagation — the gold equations cannot
            distinguish them, so no solver can pin the token (the
            information-theoretic ceiling for this artifact);
          - ``unpruned``: candidate set too large for the joint-consistency
            probe (bounded only by per-equation constraints).
        """
        segments = []
        amb_tokens: Dict[int, int] = {}
        for toks, data in self.eqs:
            missing = sorted({t for t in toks if t not in self.known})
            if not missing:
                continue
            entry = {"text": data.decode("utf-8", "replace"), "unresolved": []}
            for t in missing:
                vals = sorted(self.cand.get(t, set()))
                kind = "ambiguous" if len(vals) >= 2 else "unpruned"
                amb_tokens[t] = len(vals)
                entry["unresolved"].append(
                    {
                        "token": t,
                        "n_candidates": len(vals),
                        "kind": kind,
                        "candidates": [
                            v.decode("latin-1") for v in vals[:6]
                        ],
                    }
                )
            segments.append(entry)
        return {
            "undecoded_segments": len(segments),
            "unresolved_tokens": len(amb_tokens),
            "candidate_histogram": {
                str(n): sum(1 for c in amb_tokens.values() if c == n)
                for n in sorted(set(amb_tokens.values()))
            },
            "segments": segments,
        }

    def report(self) -> dict:
        uniq = {t for toks, _ in self.eqs for t in toks}
        full = exact = 0
        for toks, data in self.eqs:
            if all(t in self.known for t in toks):
                full += 1
                if b"".join(self.known[t] for t in toks) == data:
                    exact += 1
        return {
            "unique_text_tokens": len(uniq),
            "resolved": sum(1 for t in uniq if t in self.known),
            "segments": len(self.eqs),
            "fully_decodable": full,
            "exact": exact,
            "ambiguous": sum(1 for t in self.cand if t not in self.known),
        }


def equations_from_gold(path: str) -> List[Tuple[List[int], bytes]]:
    gold = json.load(open(path))
    eqs = []
    for seg in gold["segments"]:
        toks = [t for t in seg["tokens"] if t < TEXT_TOKEN_LIMIT]
        eqs.append((toks, seg["text"].encode("utf-8")))
    return eqs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("gold_json", help="gold transcription json (segments with tokens+text)")
    ap.add_argument("-o", "--output", required=True, help="output vocab json")
    ap.add_argument(
        "--refine",
        action="store_true",
        help="branch-and-prune joint-consistency pass (slower; resolves "
        "tokens whose per-equation candidates are jointly inconsistent)",
    )
    ap.add_argument(
        "--maximality",
        default=None,
        metavar="OUT_JSON",
        help="write the per-undecoded-segment ambiguity accounting "
        "(which tokens stay unresolved and why)",
    )
    args = ap.parse_args(argv)

    solver = GoldVocabSolver(equations_from_gold(args.gold_json))
    known = solver.solve()
    if args.refine:
        n = solver.refine_by_trial()
        print(f"trial refinement resolved {n} additional tokens", file=sys.stderr)
    rep = solver.report()
    print(json.dumps(rep, indent=2))
    if args.maximality:
        with open(args.maximality, "w") as f:
            json.dump(solver.maximality_report(), f, indent=1)
        print(f"maximality report -> {args.maximality}", file=sys.stderr)

    # latin-1 round-trips arbitrary bytes through JSON strings
    out = {str(t): v.decode("latin-1") for t, v in sorted(known.items())}
    with open(args.output, "w") as f:
        json.dump(out, f, ensure_ascii=True, indent=0)
    print(f"wrote {len(out)} entries to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
