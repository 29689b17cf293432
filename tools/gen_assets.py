"""Regenerate assets/ from the upstream public-domain Cornell Box data.

The Cornell Box OBJ/MTL ("CornellBox-Original" by Guedis Cardenas and Morgan
McGuire, Williams College 2011, released into the Public Domain,
https://graphics.cs.williams.edu/data) is re-emitted in canonical formatting.
Run with the upstream files available (e.g. /root/reference/assets) to
regenerate; the generated files are committed so the repo is self-contained.
"""

from __future__ import annotations

import os
import re
import sys


def canonicalize_obj(src: str, dst: str) -> None:
    verts: list[tuple[float, float, float]] = []
    out_lines = ["# CornellBox-Original (Cardenas & McGuire 2011, Public Domain)",
                 "# canonical re-emission; see tools/gen_assets.py",
                 "mtllib CornellBox-Original.mtl"]
    with open(src) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            if parts[0] == "v":
                verts.append(tuple(float(x) for x in parts[1:4]))
                out_lines.append("v %.6g %.6g %.6g" % verts[-1])
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(len(verts) + i + 1 if i < 0 else i)
                out_lines.append("f " + " ".join(str(i) for i in idx))
            elif parts[0] in ("usemtl", "g", "o"):
                out_lines.append(" ".join(parts))
    with open(dst, "w") as f:
        f.write("\n".join(out_lines) + "\n")


def canonicalize_mtl(src: str, dst: str) -> None:
    out = ["# CornellBox-Original materials (Public Domain); canonical re-emission"]
    with open(src) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            if parts[0] == "newmtl":
                out.append("")
                out.append("newmtl " + parts[1])
            elif parts[0] in ("Ka", "Kd", "Ks", "Ke"):
                out.append("%s %.6g %.6g %.6g" % (parts[0], *map(float, parts[1:4])))
            elif parts[0] in ("Ns", "Ni", "illum", "d"):
                out.append("%s %.6g" % (parts[0], float(parts[1])))
    with open(dst, "w") as f:
        f.write("\n".join(out) + "\n")


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets"
    dst_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")
    os.makedirs(dst_dir, exist_ok=True)
    canonicalize_obj(
        os.path.join(src_dir, "CornellBox-Original.obj"),
        os.path.join(dst_dir, "CornellBox-Original.obj"),
    )
    canonicalize_mtl(
        os.path.join(src_dir, "CornellBox-Original.mtl"),
        os.path.join(dst_dir, "CornellBox-Original.mtl"),
    )
    print("wrote", dst_dir)


if __name__ == "__main__":
    main()
