#!/usr/bin/env bash
# THE source-tree hash that binds bench_detail.json to the code it
# measured — bench_detail.sh stamps it, gate.sh verifies it. One
# definition: a drift between two inlined copies would make the gate
# permanently red (or permanently blind) with a baffling message.
set -euo pipefail
cd "$(dirname "$0")/.."
find src/main -name '*.scala' -type f | sort | xargs sha256sum | sha256sum | cut -c1-16
