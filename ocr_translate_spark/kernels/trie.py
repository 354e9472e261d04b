"""Frequency trie for dictionary-based text repair.

Semantics-parity reimplementation of the reference's trie
(ref: ocr_translate/trie.py:21-373) written from scratch: the reference
uses linked TrieNode objects and recursion; here the trie is a dict-of-dicts
with sentinel keys and the traversals are iterative/generator-based.  The
observable contract is identical:

* ``search(word, strict=False)`` skips characters never seen in any inserted
  word (non-strict mode), mirroring ref trie.py:58-87.
* ``decompose(word, min_length)`` yields every way to split ``word`` into
  dictionary words (each piece found via non-strict search), in the same
  branch order as the reference's prefix-length-ascending recursion
  (ref trie.py:154-191), so downstream ``max()`` tie-breaking matches.
* ``get_freq`` returns 0.0 for non-words (ref trie.py:89-109).
* autocomplete / substitutions / deletions / insertions / autocorrect_bayes
  mirror ref trie.py:111-352 (result sets equal; ordering is by descending
  frequency with deterministic first-seen tie-break, where the reference's
  ``list(set(...))`` leaves ties unordered).

At Spark scale the trie is built once on the driver from a ``dictionary``
table and shipped to executors as a broadcast variable consumed inside the
normalization pandas UDF (SURVEY.md §1.3).
"""

from __future__ import annotations

# Sentinel keys inside the nested-dict representation. Real edges are
# single-character keys, so multi-char sentinels can never collide.
_WORD = "\0is_word"
_FREQ = "\0freq"


class Trie:
    """Prefix tree over single characters with per-word log-frequency."""

    def __init__(self) -> None:
        self._root: dict = {}
        self.charset: set[str] = set()

    # -- construction -------------------------------------------------

    def insert(self, word: str, freq: float = 0.0) -> None:
        """Add ``word`` with frequency ``freq`` (ref trie.py:46-56)."""
        self.charset.update(word)
        node = self._root
        for ch in word:
            node = node.setdefault(ch, {})
        node[_WORD] = True
        node[_FREQ] = freq

    @classmethod
    def from_rows(cls, rows) -> "Trie":
        """Build from (word, freq) pairs, e.g. a collected dictionary table.

        Missing/None frequency maps to -1e-4 exactly as the reference's
        dictionary loader does (ref: ocr_translate/models/base.py:181).
        """
        trie = cls()
        for word, freq in rows:
            trie.insert(word, -1e-4 if freq is None else float(freq))
        return trie

    # -- lookup --------------------------------------------------------

    def _walk(self, word: str, strict: bool):
        """Follow ``word`` edge by edge; None if the path leaves the trie."""
        node = self._root
        for ch in word:
            if ch not in self.charset:
                if strict:
                    return None
                continue  # non-strict: unknown characters are transparent
            nxt = node.get(ch)
            if nxt is None:
                return None
            node = nxt
        return node

    def search(self, word: str, strict: bool = False) -> bool:
        """True if ``word`` is a dictionary word (ref trie.py:58-87).

        Non-strict search ignores characters outside the trie's charset; a
        word made *only* of unknown characters therefore resolves to the
        root, which the reference treats as found (trie.py:84-85).
        """
        node = self._walk(word, strict)
        if node is None:
            return False
        if node is self._root and not strict:
            return True
        return node.get(_WORD, False)

    def get_freq(self, word: str) -> float:
        """Frequency of ``word``; 0.0 when absent (ref trie.py:89-109)."""
        node = self._root
        for ch in word:
            nxt = node.get(ch)
            if nxt is None:
                return 0.0
            node = nxt
        return node.get(_FREQ, 0.0) if node.get(_WORD, False) else 0.0

    def __contains__(self, word: str) -> bool:
        return self.search(word, strict=True)

    # -- prefix expansion ----------------------------------------------

    def autocomplete(self, prefix: str) -> list[str]:
        """Words starting with ``prefix``, highest frequency first
        (ref trie.py:111-152)."""
        node = self._root
        for ch in prefix:
            node = node.get(ch)
            if node is None:
                return []
        out: list[str] = []
        stack = [(node, prefix)]
        while stack:
            cur, acc = stack.pop()
            if cur.get(_WORD, False):
                out.append(acc)
            # reversed so the pop order matches insertion order (cosmetic;
            # the final sort is by frequency anyway)
            for ch in reversed(list(cur)):
                if ch in (_WORD, _FREQ):
                    continue
                stack.append((cur[ch], acc + ch))
        out.sort(key=self.get_freq, reverse=True)
        return out

    # -- decomposition (missing-space restore) --------------------------

    def decompose(self, word: str, min_length: int = 3) -> list[list[str]]:
        """All splits of ``word`` into dictionary words of length >=
        ``min_length`` (ref trie.py:154-191).

        E.g. ``thisissparta`` (min_length=2) ->
        ``[['this','is','spar','ta'], ['this','is','sparta']]``.
        Branch order matches the reference (prefix length ascending, depth
        first) so that ``max(..., key=score)`` picks the same winner on ties.
        """
        if len(word) < min_length:
            return [[word]]
        return list(self._decompositions(word, min_length))

    def _decompositions(self, word: str, min_length: int):
        n = len(word)
        for i in range(min_length, n + 1):
            prefix = word[:i]
            if not self.search(prefix):  # non-strict, as in ref trie.py:182
                continue
            if i == n:
                yield [prefix]
            else:
                for rest in self._decompositions(word[i:], min_length):
                    yield [prefix] + rest

    # -- edit-distance expansion (autocorrect primitives) ---------------

    def _substitutions(self, word: str, max_num: int, invalid_ok: bool):
        """One-or-more single-character substitutions (ref trie.py:214-236)."""
        results: list[str] = []
        if max_num == 0:
            return results
        node = self._root
        for i, ch_in in enumerate(word):
            for ch in node:
                if ch in (_WORD, _FREQ) or ch == ch_in:
                    continue
                cand = word[: i] + ch + word[i + 1:]
                if invalid_ok or self._suffix_is_word(word[i + 1:], node[ch]):
                    results.append(cand)
                results.extend(self._substitutions(cand, max_num - 1, invalid_ok))
            node = node.get(ch_in)
            if node is None:
                break
        return results

    def _suffix_is_word(self, suffix: str, node: dict) -> bool:
        """Strict search for ``suffix`` continuing from ``node``."""
        for ch in suffix:
            if ch not in self.charset:
                return False
            node = node.get(ch)
            if node is None:
                return False
        return node.get(_WORD, False)

    def get_all_substitutions(self, word: str, max_num: int = 1) -> list[str]:
        """Distinct substitution candidates, frequency-descending
        (ref trie.py:193-212)."""
        cands = self._substitutions(word, min(max_num, len(word)), False)
        return self._rank_unique(cands, exclude=word)

    def _deletions(self, word: str, max_num: int):
        results: list[str] = []
        if max_num == 0:
            return results
        for i in range(len(word)):
            cand = word[: i] + word[i + 1:]
            if self.search(cand, strict=True):
                results.append(cand)
            results.extend(self._deletions(cand, max_num - 1))
        return results

    def get_all_deletions(self, word: str, max_num: int = 1) -> list[str]:
        """Distinct deletion candidates (ref trie.py:238-270)."""
        return self._rank_unique(self._deletions(word, min(max_num, len(word))))

    def _insertions(self, word: str, max_num: int):
        results: list[str] = []
        if max_num == 0:
            return results
        for i in range(len(word) + 1):
            for ch in self.charset:
                cand = word[: i] + ch + word[i:]
                if self.search(cand, strict=True):
                    results.append(cand)
                results.extend(self._insertions(cand, max_num - 1))
        return results

    def get_all_insertions(self, word: str, max_num: int = 1) -> list[str]:
        """Distinct insertion candidates (ref trie.py:272-303)."""
        return self._rank_unique(self._insertions(word, max_num))

    def autocorrect_bayes(
        self, word: str, max_num: int = 1, distance_exp_factor: float = 2
    ) -> list[str]:
        """Candidate corrections ranked by freq damped by edit distance
        (ref trie.py:305-352)."""
        scored: list[tuple[str, float]] = []
        if self.search(word):
            scored.append((word, self.get_freq(word)))

        def expand(w: str, budget: int):
            if budget == 0:
                return
            # combinations of substitutions followed by deletions/insertions
            for i in range(1, budget):
                for sub in self._substitutions(w, i, True):
                    for cand in self._deletions(sub, budget - i):
                        scored.append((cand, self._bayes_score(cand, budget, distance_exp_factor)))
                    for cand in self._insertions(sub, budget - i):
                        scored.append((cand, self._bayes_score(cand, budget, distance_exp_factor)))
            for cand in self._substitutions(w, budget, False):
                scored.append((cand, self._bayes_score(cand, budget, distance_exp_factor)))
            for cand in self._deletions(w, budget):
                scored.append((cand, self._bayes_score(cand, budget, distance_exp_factor)))
            for cand in self._insertions(w, budget):
                scored.append((cand, self._bayes_score(cand, budget, distance_exp_factor)))
            expand(w, budget - 1)

        expand(word, max_num)
        scored.sort(key=lambda t: t[1], reverse=True)
        out: list[str] = []
        for cand, _ in scored:
            if cand not in out:
                out.append(cand)
        return out

    def _bayes_score(self, word: str, dist: int, exp_factor: float) -> float:
        return self.get_freq(word) / (dist + 1) ** exp_factor

    def _rank_unique(self, cands: list[str], exclude: str | None = None) -> list[str]:
        seen: list[str] = []
        for c in cands:
            if c != exclude and c not in seen:
                seen.append(c)
        seen.sort(key=self.get_freq, reverse=True)
        return seen
