#!/bin/bash
# Point git at the versioned hooks dir (pre-commit compile guard).
cd "$(dirname "$0")/.." || exit 1
chmod +x dev/hooks/*
git config core.hooksPath dev/hooks
echo "hooksPath -> dev/hooks"
