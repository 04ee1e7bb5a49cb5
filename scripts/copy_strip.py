#!/usr/bin/env python
"""Strip lineage-derived tables from a signal catalog — the engine's analog
of the reference CLI (/root/reference/scripts/copy_strip:1-33), which
copies an .nwb file minus its 'preprocessing' module.

Catalog form: derived tables are separate parquet directories under the
catalog root (downsampled_*, CAR_ln_*, wvlt_amp_*, ...), so "strip" is a
directory-level operation — no data rewrite, unlike the NWB re-export.

  copy_strip.py ROOT            strip ROOT in place (drop derived tables)
  copy_strip.py ROOT DST        copy only the raw tables to DST (ROOT
                                untouched) — the reference's src->dst form
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> list:
    from process_nwb_spark.sources.catalog import LINEAGE_PREFIXES

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src_root", type=str, help="Source catalog root")
    p.add_argument("dst_root", type=str, nargs="?", default=None,
                   help="Destination root; if omitted, src is stripped "
                        "in place")
    args = p.parse_args(argv)

    def _is_derived(t: str) -> bool:
        # both storage forms: plain lineage directories AND the bucketed
        # form write_bucketed stores under _bucketed_<name> (a bucketed
        # RAW table stays raw; note: metastore entries for bucketed
        # tables are session-scoped — SignalCatalog.drop handles them
        # when a session is live, a bare filesystem strip cannot)
        if t.startswith("_bucketed_"):
            t = t[len("_bucketed_"):]
        return t.startswith(LINEAGE_PREFIXES)

    tables = sorted(
        d for d in os.listdir(args.src_root)
        if os.path.isdir(os.path.join(args.src_root, d)))
    derived = [t for t in tables if _is_derived(t)]
    raw = [t for t in tables if t not in derived]

    if args.dst_root is None:
        if not derived:
            print("No preprocessing tables exist")
        for t in derived:
            shutil.rmtree(os.path.join(args.src_root, t))
            print(f"dropped {t}")
        return derived

    os.makedirs(args.dst_root, exist_ok=True)
    for t in raw:
        shutil.copytree(os.path.join(args.src_root, t),
                        os.path.join(args.dst_root, t), dirs_exist_ok=True)
        print(f"copied {t}")
    return raw


if __name__ == "__main__":
    main()
