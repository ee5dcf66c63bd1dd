#!/bin/bash -e
# Repo lint gate. Reference analog: /root/reference/dev/linter.sh
# (isort/black/flake8 — none of which ship in this container, so the
# checks live in dev/lint.py: syntax, unused imports, whitespace hygiene,
# docstring + logger discipline in library code).
cd "$(dirname "${BASH_SOURCE[0]}")/.."
python dev/lint.py
