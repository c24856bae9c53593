"""Regenerate docs/api.md: public symbols per namespace, one line each.

Run: python tools/gen_api.py  (kept in sync by
tests/test_namespace_parity.py's namespace audit).
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SECTIONS = [
    ("ouster_sdk_tpu", "Top level (reference `ouster.sdk.core` surface)"),
    ("ouster_sdk_tpu.io", "IO: pcap / OSF / bag / sources"),
    ("ouster_sdk_tpu.sensor", "Live sensor"),
    ("ouster_sdk_tpu.utils", "Utilities"),
    ("ouster_sdk_tpu.viz", "Visualization"),
    ("ouster_sdk_tpu.slam", "Mapping / SLAM"),
    ("ouster_sdk_tpu.zone", "Zone monitoring"),
]


def describe(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    line = doc.splitlines()[0].strip() if doc else ""
    if len(line) > 82:
        line = line[:82] + "..."
    return line


def kind(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if callable(obj):
        return "fn"
    if inspect.ismodule(obj):
        return "module"
    return "const"


def main() -> None:
    import importlib

    out = ["# API reference", "",
           "Public symbols per namespace (one line each; generated from "
           "the", "package by tools/gen_api.py, kept in sync by "
           "tests/test_namespace_parity.py).", ""]
    for modname, title in SECTIONS:
        mod = importlib.import_module(modname)
        out.append(f"## `{modname}` — {title}")
        out.append("")
        names = getattr(mod, "__all__", None) or [
            n for n in dir(mod) if not n.startswith("_")]
        for n in sorted(set(names)):
            obj = getattr(mod, n, None)
            if inspect.ismodule(obj):
                continue
            d = describe(obj)
            suffix = f" — {d}" if d else ""
            out.append(f"- `{n}` ({kind(obj)}){suffix}")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
