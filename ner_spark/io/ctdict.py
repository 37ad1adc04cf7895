"""Cedar ``.ct`` binary automaton compatibility (figa file migration).

The reference persists its gazetteer as a CEDAR double-array dump —
``save`` writes the raw node array, little-endian ``(int32 base_,
int32 check)`` pairs and nothing else (figa/src/cedar.h:231-236; the
shipped Makefile defines none of USE_FAST_LOAD/USE_REDUCED_TRIE, so
there is no ``.sbl`` sidecar and ``base()`` is the plain field) — and
selects the loader by the ``.ct`` extension (figa_cedar.cpp:32-41).

Trie semantics (cedar.h:417-435 ``_find``): child of node ``f`` under
byte ``c`` is ``base(f) ^ c``, valid iff its ``check == f``; a key's
value sits in the ``base_`` field of the label-0 child.  Free slots
carry negative ``check``.  Namelist multi-values are encoded as extra
keys: value ``k+1`` of a key lives at ``key + b'\\x01' * (k + 2)``
(figa_cedar.cpp:199-221 ``LoadItems``; walked back one ``\\x01`` at a
time by ``get_values``, figa_cedar.tpp:20-48).  The fragment marker
``N`` is value 0 (figa_cedar.cpp:101-102 ``get_numbers``) — the same
sentinel this repo's namelists use.

``read_ct`` decodes a figa-written ``.ct`` back into a namelist dict;
``write_ct`` builds a static XOR-addressed double array the unmodified
figa binary loads and queries (tests/test_ctdict.py compiles the
reference's figa from source when a toolchain is present and checks
lookups byte-for-byte).  This is MIGRATION tooling for existing binary
automata, driver-sized by design; the engine's runtime artifact remains
the broadcast pickle (kb/artifacts.py), which SURVEY §2 S7/S11 cover.
"""

from __future__ import annotations

import numpy as np

# cedar pads its array to 256-slot blocks (cedar.h block struct); keeping
# that invariant means base ^ c never indexes past the end for any byte c,
# because XOR with c < 256 stays inside the 256-aligned block of base.
_BLOCK = 256


def _expand_items(items) -> list[tuple[bytes, int]]:
    """Namelist (key → ordered values) → cedar key set per LoadItems:
    first value on the key itself, value k+1 on key + 0x01*(k+2)."""
    out: list[tuple[bytes, int]] = []
    for key, ids in items:
        kb = key.encode("utf-8")
        for j, v in enumerate(ids):
            out.append((kb if j == 0 else kb + b"\x01" * (j + 2), int(v)))
    return out


def write_ct(items, path: str) -> int:
    """Compile namelist items into a figa-loadable ``.ct`` double array.

    ``items``: iterable of (key, ordered value list) — e.g.
    ``build_namelist(...).items()`` or ``GazetteerAutomaton.keys.items()``.
    Static first-fit XOR packing (deterministic); returns the node count
    written.  Keys must not contain NUL or 0x01 bytes (0x01 is the
    multi-value escape, NUL the value label)."""
    entries = _expand_items(items)
    for kb, _ in entries:
        if b"\x00" in kb or b"\x01" in kb.rstrip(b"\x01"):
            raise ValueError(f"key not representable in .ct: {kb!r}")

    # byte-trie: node = {label: child_node}, value under the -1 sentinel
    root: dict = {}
    for kb, v in entries:
        node = root
        for b in kb:
            node = node.setdefault(b, {})
        node[-1] = v

    used = bytearray(_BLOCK)   # slot occupancy, grown in block units
    base_arr = [0] * _BLOCK
    check_arr = [-1] * _BLOCK
    used[0] = 1                # root lives at slot 0

    def grow(upto: int) -> None:
        need = ((upto // _BLOCK) + 1) * _BLOCK
        if need > len(used):
            pad = need - len(used)
            used.extend(b"\x00" * pad)
            base_arr.extend([0] * pad)
            check_arr.extend([-1] * pad)

    # BFS so parent slots are fixed before children are placed
    queue: list[tuple[int, dict]] = [(0, root)]
    while queue:
        slot, node = queue.pop(0)
        labels = sorted(0 if l == -1 else l for l in node)
        if not labels:
            continue
        b = 0
        while True:
            grow(b + _BLOCK - 1)
            if all(not used[b ^ l] and (b ^ l) != 0 for l in labels):
                break
            b += 1
        base_arr[slot] = b
        for l in labels:
            child = b ^ l
            used[child] = 1
            check_arr[child] = slot
            sub = node[-1 if l == 0 else l]
            if l == 0:
                base_arr[child] = sub          # the value leaf
            else:
                queue.append((child, sub))

    arr = np.empty((len(used), 2), dtype="<i4")
    arr[:, 0] = base_arr
    arr[:, 1] = check_arr
    arr.tofile(path)
    return len(used)


def read_ct(path: str) -> dict[str, list[int]]:
    """Decode a ``.ct`` (cedar node dump — figa-written or write_ct's)
    back into a namelist dict (key → values in namelist order)."""
    arr = np.fromfile(path, dtype="<i4")
    if arr.size % 2:
        raise ValueError(f"{path}: odd int32 count, not a cedar node dump")
    arr = arr.reshape(-1, 2)
    base, check = arr[:, 0], arr[:, 1]
    n = len(arr)
    if n == 0:
        return {}

    # in-use nodes have check >= 0 (free-list entries are negative);
    # node 0 is the root whatever its check says
    idx = np.arange(n)
    in_use = (check >= 0) & (idx != 0) & (check < n)
    # a node's label: base(parent) ^ self — genuine children land < 256
    label = np.where(in_use, base[np.clip(check, 0, n - 1)] ^ idx, -1)
    valid = in_use & (label >= 0) & (label < 256)
    # guard against free-list slots that happen to look positive:
    # require parent's base to actually address the child
    terminals = idx[valid & (label == 0)]

    parent = check  # alias for walk-up readability
    out: dict[str, list[tuple[int, int]]] = {}
    for t in terminals.tolist():
        p = int(parent[t])
        bs = bytearray()
        ok = True
        while p != 0:
            if not valid[p]:
                ok = False
                break
            bs.append(int(label[p]))
            p = int(parent[p])
        if not ok:
            continue
        bs.reverse()
        kb = bytes(bs)
        core = kb.rstrip(b"\x01")
        n01 = len(kb) - len(core)
        if n01 == 1 or (n01 == 0 and not core):
            continue  # no 1-deep \x01 node carries a value; skip junk
        pos = 0 if n01 == 0 else n01 - 2
        try:
            key = core.decode("utf-8")
        except UnicodeDecodeError:
            continue
        out.setdefault(key, []).append((pos, int(base[t])))

    return {k: [v for _, v in sorted(pv)] for k, pv in out.items()}
