#!/usr/bin/env python
"""Docker build smoke-check (no daemon needed): verify every COPY/ADD source
in ssdx/serve/Dockerfile exists in the build context (the repo root), so the
image is buildable as shipped.  Round-1 shipped a Dockerfile COPYing a
directory absent from the repo — this guards against that class of breakage.

Usage: python scripts/check_docker_context.py  (exit 0 = buildable)
"""
from __future__ import annotations

import shlex
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCKERFILE = REPO / "ssdx" / "serve" / "Dockerfile"


def copy_sources(dockerfile: Path) -> list[str]:
    """COPY/ADD source operands (all but the last operand per instruction)."""
    sources: list[str] = []
    for raw in dockerfile.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = shlex.split(line)
        if parts and parts[0].upper() in ("COPY", "ADD"):
            operands = [p for p in parts[1:] if not p.startswith("--")]
            sources.extend(operands[:-1])
    return sources


def main() -> int:
    missing = []
    for src in copy_sources(DOCKERFILE):
        if src.startswith(("http://", "https://")):
            continue
        # docker glob: check the literal path or any glob match
        if not (REPO / src).exists() and not list(REPO.glob(src)):
            missing.append(src)
    if missing:
        print(f"MISSING build-context sources for {DOCKERFILE}:")
        for m in missing:
            print(f"  {m}")
        return 1
    print(f"ok: all COPY/ADD sources in {DOCKERFILE.relative_to(REPO)} exist")
    return 0


if __name__ == "__main__":
    sys.exit(main())
