"""Regenerate the count-bearing docs after a registry change:
rewrites README.md's two live query-count mentions and REGISTRY.md
(via gen_registry). Run before committing any inventory edit; the
pre-commit doc-drift gate enforces the result."""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from kafka_streams_pipeline_spark import inventory  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import gen_registry  # noqa: E402


def main() -> None:
    n = len(inventory.QUERIES)
    readme = pathlib.Path(__file__).parent.parent / "README.md"
    text = readme.read_text()
    text = re.sub(r"\d+ entries in", f"{n} entries in", text)
    text = re.sub(r"all \d+ queries", f"all {n} queries", text)
    readme.write_text(text)
    repo = pathlib.Path(__file__).parent.parent
    (repo / "REGISTRY.md").write_text(gen_registry.render())
    print(f"synced README.md + REGISTRY.md to {n} queries")


if __name__ == "__main__":
    main()
