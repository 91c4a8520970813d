"""Suffix-automaton longest-common-substring — the "suffix-array substring
match" channel named in the north rule.  No reference implementation
exists (the C library is sketch-only); built from the published
suffix-automaton construction (Blumer et al. 1985; cp-algorithms
presentation).  Used per candidate pair in the verification stage when
``cfg.substring_check`` is on.
"""

from __future__ import annotations


def build_suffix_automaton(s: str):
    """Returns (link, length, transitions) arrays for the automaton of s."""
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict[str, int]] = [{}]
    last = 0
    for ch in s:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        p = last
        while p != -1 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                while p != -1 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    return sa_link, sa_len, sa_next


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring of a and b, O(|a| + |b|)."""
    if not a or not b:
        return 0
    link, length, nxt = build_suffix_automaton(a)
    v = 0
    cur_len = 0
    best = 0
    for ch in b:
        while v and ch not in nxt[v]:
            v = link[v]
            cur_len = length[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            cur_len += 1
        else:
            v = 0
            cur_len = 0
        if cur_len > best:
            best = cur_len
    return best


def lcs_ratio(a: str, b: str) -> float:
    """LCS length normalized by the shorter string (1.0 = one contains a
    full copy of the other's shorter text)."""
    n = min(len(a or ""), len(b or ""))
    if n == 0:
        return 0.0
    return longest_common_substring_len(a, b) / n
