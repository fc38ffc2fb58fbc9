"""Kaldi-style data-directory utilities.

Python port of the capability of the vendored kaldi-utils snapshot the
reference ships for offline data prep (`/root/reference/tools/kaldi/utils/**`
— shell/perl: `filter_scp.pl`, `apply_map.pl`, `int2sym.pl`, `sym2int.pl`,
`spk2utt_to_utt2spk.pl`, `utt2spk_to_spk2utt.pl`, `fix_data_dir.sh`,
`copy_data_dir.sh`, `data/combine_data.sh`, `subset_data_dir.sh`,
`split_scp.pl`, `data/remove_dup_utts.sh`, `validate_data_dir.sh`).

A kaldi data dir is a directory of whitespace-separated key-value text
files sharing the utterance-id key space: `wav.scp`, `text`, `utt2spk`,
`spk2utt`, `segments`, `utt2dur`, ... These functions operate on dicts
(`{utt_id: value}`) and directories of such files, preserving kaldi's
invariants (sorted unique keys, utt<->spk consistency).

The FST/LM lexicon tooling (`utils/lang/make_phone_lm.py` etc.) belongs to
kaldi ASR training, which the reference never invokes — out of scope per
SURVEY.md §2.10 (port on demand).

CLI: ``python -m uniaudio2_tpu.data.kaldi <subcommand> ...``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

# files keyed by utterance id / by speaker id (validate + fix use these)
UTT_FILES = ("wav.scp", "text", "utt2spk", "utt2dur", "utt2num_frames",
             "feats.scp", "vad.scp", "utt2lang", "utt2uniq", "segments")
SPK_FILES = ("spk2utt", "spk2gender", "cmvn.scp")


# ---------------------------------------------------------------------------
# scp-style file primitives
# ---------------------------------------------------------------------------


def read_scp(path: str) -> Dict[str, str]:
    """Read a `key rest-of-line` file into an ordered dict."""
    out: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split(None, 1)
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_scp(path: str, table: Dict[str, str], sort: bool = True) -> None:
    keys = sorted(table) if sort else list(table)
    with open(path, "w", encoding="utf-8") as f:
        for k in keys:
            v = table[k]
            f.write(f"{k} {v}\n" if v != "" else f"{k}\n")


def filter_scp(ids: Iterable[str], table: Dict[str, str],
               exclude: bool = False) -> Dict[str, str]:
    """Keep (or with ``exclude`` drop) entries whose key is in ``ids``
    (`filter_scp.pl`)."""
    idset = set(ids)
    return {k: v for k, v in table.items() if (k in idset) != exclude}


def apply_map(table: Dict[str, str], mapping: Dict[str, str],
              permissive: bool = False) -> Dict[str, str]:
    """Map each whitespace token of every value through ``mapping``
    (`apply_map.pl` / `sym2int.pl` / `int2sym.pl` semantics; with
    ``permissive`` unknown tokens pass through instead of raising)."""
    out = {}
    for k, v in table.items():
        toks = []
        for t in v.split():
            if t in mapping:
                toks.append(mapping[t])
            elif permissive:
                toks.append(t)
            else:
                raise KeyError(f"apply_map: token {t!r} (utt {k}) not in map")
        out[k] = " ".join(toks)
    return out


def split_scp(table: Dict[str, str], n: int,
              utt2spk: Optional[Dict[str, str]] = None) -> List[Dict[str, str]]:
    """Split into ``n`` near-equal parts, contiguously in sorted-key order
    (`split_scp.pl`); with ``utt2spk``, speakers are never split across
    parts (`--utt2spk` option)."""
    keys = sorted(table)
    if utt2spk is None:
        bounds = [round(i * len(keys) / n) for i in range(n + 1)]
        return [{k: table[k] for k in keys[a:b]}
                for a, b in zip(bounds[:-1], bounds[1:])]
    # group keys by speaker, keep speaker blocks intact
    blocks: List[List[str]] = []
    cur_spk = object()
    for k in keys:
        spk = utt2spk.get(k)
        if spk != cur_spk:
            blocks.append([])
            cur_spk = spk
        blocks[-1].append(k)
    parts: List[Dict[str, str]] = [{} for _ in range(n)]
    total = len(keys)
    done = 0
    pi = 0
    for blk in blocks:
        # advance part when the current one has reached its quota
        while pi < n - 1 and done >= round((pi + 1) * total / n):
            pi += 1
        for k in blk:
            parts[pi][k] = table[k]
        done += len(blk)
    return parts


# ---------------------------------------------------------------------------
# utt2spk <-> spk2utt
# ---------------------------------------------------------------------------


def utt2spk_to_spk2utt(utt2spk: Dict[str, str]) -> Dict[str, str]:
    spk2utt: Dict[str, List[str]] = {}
    for u in sorted(utt2spk):
        spk2utt.setdefault(utt2spk[u], []).append(u)
    return {s: " ".join(us) for s, us in spk2utt.items()}


def spk2utt_to_utt2spk(spk2utt: Dict[str, str]) -> Dict[str, str]:
    out = {}
    for s, us in spk2utt.items():
        for u in us.split():
            out[u] = s
    return out


# ---------------------------------------------------------------------------
# data-dir operations
# ---------------------------------------------------------------------------


def _utt_tables(d: str) -> Dict[str, Dict[str, str]]:
    return {f: read_scp(os.path.join(d, f))
            for f in UTT_FILES if os.path.exists(os.path.join(d, f))}


def fix_data_dir(d: str) -> List[str]:
    """Sort every table and keep only utterances present in ALL utt-keyed
    files; regenerate spk2utt from utt2spk (`fix_data_dir.sh`). Returns the
    list of files rewritten."""
    tables = _utt_tables(d)
    if not tables:
        return []
    common = None
    for t in tables.values():
        ks = set(t)
        common = ks if common is None else (common & ks)
    rewritten = []
    for name, t in tables.items():
        write_scp(os.path.join(d, name), filter_scp(common, t))
        rewritten.append(name)
    if "utt2spk" in tables:
        u2s = filter_scp(common, tables["utt2spk"])
        write_scp(os.path.join(d, "spk2utt"), utt2spk_to_spk2utt(u2s))
        rewritten.append("spk2utt")
    return rewritten


def validate_data_dir(d: str, require: Sequence[str] = ("wav.scp", "utt2spk")
                      ) -> List[str]:
    """Return a list of problems (empty = valid) — `validate_data_dir.sh`:
    required files, sorted-unique keys, cross-file key consistency, and
    utt2spk/spk2utt agreement."""
    problems = []
    for f in require:
        if not os.path.exists(os.path.join(d, f)):
            problems.append(f"missing {f}")
    tables = _utt_tables(d)
    keysets = {}
    for name, t in tables.items():
        with open(os.path.join(d, name), encoding="utf-8") as fh:
            raw = [ln.split(None, 1)[0] for ln in fh if ln.strip()]
        if raw != sorted(raw):
            problems.append(f"{name}: keys not sorted")
        if len(raw) != len(set(raw)):
            problems.append(f"{name}: duplicate keys")
        keysets[name] = set(t)
    if len(keysets) > 1:
        base_name, base = next(iter(keysets.items()))
        for name, ks in keysets.items():
            if ks != base:
                problems.append(
                    f"{name}: utterances differ from {base_name} "
                    f"({len(ks ^ base)} mismatched)")
    s2u_path = os.path.join(d, "spk2utt")
    if "utt2spk" in tables and os.path.exists(s2u_path):
        regen = utt2spk_to_spk2utt(tables["utt2spk"])
        if regen != read_scp(s2u_path):
            problems.append("spk2utt inconsistent with utt2spk")
    return problems


def copy_data_dir(src: str, dst: str, *, utt_prefix: str = "",
                  spk_prefix: str = "") -> None:
    """Copy a data dir, optionally prefixing utterance/speaker ids
    (`copy_data_dir.sh --utt-prefix/--spk-prefix`)."""
    os.makedirs(dst, exist_ok=True)
    for name in UTT_FILES:
        p = os.path.join(src, name)
        if not os.path.exists(p):
            continue
        t = read_scp(p)
        if name == "utt2spk":
            t = {utt_prefix + u: spk_prefix + s for u, s in t.items()}
        else:
            t = {utt_prefix + u: v for u, v in t.items()}
        write_scp(os.path.join(dst, name), t)
    u2s_path = os.path.join(dst, "utt2spk")
    if os.path.exists(u2s_path):
        write_scp(os.path.join(dst, "spk2utt"),
                  utt2spk_to_spk2utt(read_scp(u2s_path)))
    for extra in ("frame_shift",):
        p = os.path.join(src, extra)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst, extra))


def combine_data(dst: str, srcs: Sequence[str]) -> None:
    """Merge data dirs (`data/combine_data.sh`); duplicate utterance ids
    raise."""
    os.makedirs(dst, exist_ok=True)
    for name in UTT_FILES:
        merged: Dict[str, str] = {}
        found = False
        for s in srcs:
            p = os.path.join(s, name)
            if not os.path.exists(p):
                continue
            found = True
            t = read_scp(p)
            dup = set(t) & set(merged)
            if dup:
                raise ValueError(
                    f"combine_data: duplicate utt ids in {name}: "
                    f"{sorted(dup)[:5]}")
            merged.update(t)
        if found:
            write_scp(os.path.join(dst, name), merged)
    u2s = os.path.join(dst, "utt2spk")
    if os.path.exists(u2s):
        write_scp(os.path.join(dst, "spk2utt"),
                  utt2spk_to_spk2utt(read_scp(u2s)))


def subset_data_dir(src: str, dst: str, *, n: Optional[int] = None,
                    utt_list: Optional[Iterable[str]] = None,
                    per_spk: Optional[int] = None) -> None:
    """`subset_data_dir.sh`: keep the first ``n`` utterances, an explicit
    ``utt_list``, or ``per_spk`` utterances per speaker."""
    u2s = read_scp(os.path.join(src, "utt2spk"))
    if utt_list is not None:
        keep = set(utt_list)
    elif per_spk is not None:
        keep = set()
        count: Dict[str, int] = {}
        for u in sorted(u2s):
            s = u2s[u]
            if count.get(s, 0) < per_spk:
                keep.add(u)
                count[s] = count.get(s, 0) + 1
    elif n is not None:
        keep = set(sorted(u2s)[:n])
    else:
        raise ValueError("one of n / utt_list / per_spk is required")
    copy_data_dir(src, dst)
    for name in UTT_FILES:
        p = os.path.join(dst, name)
        if os.path.exists(p):
            write_scp(p, filter_scp(keep, read_scp(p)))
    write_scp(os.path.join(dst, "spk2utt"),
              utt2spk_to_spk2utt(filter_scp(keep, u2s)))


def remove_dup_utts(d: str, max_count: int) -> int:
    """Limit identical transcripts to ``max_count`` occurrences
    (`data/remove_dup_utts.sh`); returns the number removed."""
    text = read_scp(os.path.join(d, "text"))
    seen: Dict[str, int] = {}
    keep = set()
    for u in sorted(text):
        c = seen.get(text[u], 0)
        if c < max_count:
            keep.add(u)
        seen[text[u]] = c + 1
    removed = len(text) - len(keep)
    if removed:
        for name in UTT_FILES:
            p = os.path.join(d, name)
            if os.path.exists(p):
                write_scp(p, filter_scp(keep, read_scp(p)))
        u2s_path = os.path.join(d, "utt2spk")
        if os.path.exists(u2s_path):
            write_scp(os.path.join(d, "spk2utt"),
                      utt2spk_to_spk2utt(read_scp(u2s_path)))
    return removed


def split_data_dir(src: str, n: int, per_spk: bool = True) -> List[str]:
    """Write ``src/split{n}/{1..n}`` sub-dirs (`split_data.sh`); returns
    their paths."""
    u2s = read_scp(os.path.join(src, "utt2spk"))
    parts = split_scp(u2s, n, utt2spk=u2s if per_spk else None)
    outs = []
    for i, part in enumerate(parts, 1):
        sub = os.path.join(src, f"split{n}", str(i))
        subset_data_dir(src, sub, utt_list=part.keys())
        outs.append(sub)
    return outs


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="uniaudio2_tpu.data.kaldi")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("filter_scp")
    sp.add_argument("id_list")
    sp.add_argument("scp")
    sp.add_argument("--exclude", action="store_true")

    sp = sub.add_parser("fix_data_dir")
    sp.add_argument("dir")

    sp = sub.add_parser("validate_data_dir")
    sp.add_argument("dir")

    sp = sub.add_parser("copy_data_dir")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--utt-prefix", default="")
    sp.add_argument("--spk-prefix", default="")

    sp = sub.add_parser("combine_data")
    sp.add_argument("dst")
    sp.add_argument("srcs", nargs="+")

    sp = sub.add_parser("subset_data_dir")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--n", type=int)
    sp.add_argument("--per-spk", type=int)

    sp = sub.add_parser("split_data")
    sp.add_argument("dir")
    sp.add_argument("n", type=int)

    sp = sub.add_parser("spk2utt_to_utt2spk")
    sp.add_argument("spk2utt")

    sp = sub.add_parser("utt2spk_to_spk2utt")
    sp.add_argument("utt2spk")

    args = p.parse_args(argv)
    if args.cmd == "filter_scp":
        ids = read_scp(args.id_list)
        for k, v in filter_scp(ids, read_scp(args.scp),
                               exclude=args.exclude).items():
            print(f"{k} {v}" if v else k)
    elif args.cmd == "fix_data_dir":
        print("rewrote:", " ".join(fix_data_dir(args.dir)))
    elif args.cmd == "validate_data_dir":
        probs = validate_data_dir(args.dir)
        for prob in probs:
            print(prob, file=sys.stderr)
        return 1 if probs else 0
    elif args.cmd == "copy_data_dir":
        copy_data_dir(args.src, args.dst, utt_prefix=args.utt_prefix,
                      spk_prefix=args.spk_prefix)
    elif args.cmd == "combine_data":
        combine_data(args.dst, args.srcs)
    elif args.cmd == "subset_data_dir":
        subset_data_dir(args.src, args.dst, n=args.n, per_spk=args.per_spk)
    elif args.cmd == "split_data":
        for d in split_data_dir(args.dir, args.n):
            print(d)
    elif args.cmd == "spk2utt_to_utt2spk":
        for k, v in spk2utt_to_utt2spk(read_scp(args.spk2utt)).items():
            print(k, v)
    elif args.cmd == "utt2spk_to_spk2utt":
        for k, v in utt2spk_to_spk2utt(read_scp(args.utt2spk)).items():
            print(k, v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
