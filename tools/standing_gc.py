"""Standing-table garbage collection (VERDICT r8 item 8).

Every corpus a session indexes leaves its standing tables behind in the
warehouse forever — ``ovl_post_<tag>``/``ovl_size_<tag>``/``ovl_docs_
<tag>`` (overlap postings), ``mh_sigs_<tag>`` (minhash signatures),
``sim60_<tag>`` (simhash), ``inc_bands_<tag>`` (LSH bands), and
``inc_ivf_<tag>``/``inc_ivf_cent_<tag>`` (frozen IVF) — where ``tag`` is
md5(sf_dir)[:8] (the build-site convention in queries/text.py and
queries/similarity.py). That is the right default for a production
warehouse (indexes are expensive, disk is cheap), but test fixtures and
bench sweeps mint a new tag per tmp path, so the warehouse grows without
bound. This tool drops standing tables that are not attached to any
corpus the caller still cares about:

* ``--keep <sf_dir>`` (repeatable): tables whose tag matches a kept
  corpus survive UNCONDITIONALLY — age never deletes a kept corpus
  (ADVICE r9: the old AND semantics silently aged out explicitly kept
  tables, forcing a rebuild next session). A kept table with a stale
  fingerprint is harmless — the next session refuses the attach and
  rebuilds in place.
* ``--max-age-days N``: drop NON-KEPT standing dirs whose mtime is
  older than N days (with no --keep, applies to all standing dirs).
* ``--dry-run``: report only.

Catalog entries need no cleanup: the session catalog is in-memory, only
the warehouse directory survives a session (operators/bucketing.py).
Local-FS implementation — the warehouse in this environment is a local
directory; on a remote warehouse run the same listing through the
Hadoop FileSystem API.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import sys
import time

STANDING_PREFIXES = (
    "ovl_post_",
    "ovl_size_",
    "ovl_docs_",
    "mh_sigs_",
    "sim60_",
    "inc_bands_",
    "inc_ivf_cent_",
    "inc_ivf_",
    "sh_sets_",  # r10 standing shingle sets
    "ivf_cent_full_",  # r10 full-corpus coarse quantizer
    "dup_pos_",  # r11 duplicated-gram position index
)

_TAG_RE = re.compile(
    r"^(" + "|".join(p.rstrip("_") for p in STANDING_PREFIXES) + r")_([0-9a-f]{8})$"
)


def corpus_tag(sf_dir: str) -> str:
    """The table-name tag a build records for a corpus directory — must
    stay in lockstep with the build sites (md5(sf_dir)[:8])."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def scan(warehouse: str) -> list[tuple[str, str, str]]:
    """(dir_name, family_prefix, tag) for every standing table dir."""
    out = []
    if not os.path.isdir(warehouse):
        return out
    for name in sorted(os.listdir(warehouse)):
        m = _TAG_RE.match(name)
        if m and os.path.isdir(os.path.join(warehouse, name)):
            out.append((name, m.group(1) + "_", m.group(2)))
    return out


def collect_garbage(
    warehouse: str,
    keep_sf_dirs: list[str] | None = None,
    max_age_days: float | None = None,
    dry_run: bool = False,
) -> dict:
    """Drop standing tables not matching any kept corpus tag, plus —
    among the NON-kept — those older than max_age_days. A --keep match
    is unconditionally protective (ADVICE r9): age only ever binds
    tables no keep rule claimed. Returns {'kept': [...], 'dropped':
    [...]}. With neither criterion given, nothing is dropped — GC never
    guesses."""
    keep_tags = {corpus_tag(d) for d in (keep_sf_dirs or [])}
    now = time.time()
    kept, dropped = [], []
    for name, _family, tag in scan(warehouse):
        path = os.path.join(warehouse, name)
        if keep_sf_dirs is not None and tag in keep_tags:
            keep = True  # explicit keep: age never deletes it
        elif keep_sf_dirs is not None and max_age_days is None:
            keep = False  # not kept, no age rule: drop
        elif max_age_days is not None:
            keep = (now - os.path.getmtime(path)) <= max_age_days * 86400
        else:  # neither criterion
            keep = True
        if keep:
            kept.append(name)
        else:
            dropped.append(name)
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
    return {"kept": kept, "dropped": dropped}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--warehouse",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
        ),
    )
    ap.add_argument("--keep", action="append", default=None)
    ap.add_argument("--max-age-days", type=float, default=None)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    if args.keep is None and args.max_age_days is None:
        ap.error("give --keep and/or --max-age-days (GC never guesses)")
    res = collect_garbage(
        args.warehouse, args.keep, args.max_age_days, args.dry_run
    )
    verb = "would drop" if args.dry_run else "dropped"
    print(f"kept {len(res['kept'])} standing tables; {verb} {len(res['dropped'])}:")
    for name in res["dropped"]:
        print(f"  {name}")


if __name__ == "__main__":
    sys.exit(main())
