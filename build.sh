#!/usr/bin/env bash
# Build everything: native components (host hash store, cache manager,
# table server, C++ inference client) + an sdist/wheel of the package.
# Reference analog: build.sh (packages the python lib); this framework
# additionally ships native code, so the C++ targets build first.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native: hash store / cache / table server =="
make -C mindrec_tpu/native

echo "== native: serving client =="
make -C mindrec_tpu/serving

echo "== python package =="
# prefer the modern build front-end; fall back to pip wheel (errors visible)
if python -c "import build" 2>/dev/null; then
  python -m build
else
  python -m pip wheel . -w dist --no-deps
fi

echo "build complete; artifacts in dist/"
