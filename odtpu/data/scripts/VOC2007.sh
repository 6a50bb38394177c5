#!/bin/bash
# Fetch + extract PASCAL VOC2007 (trainval + test) into data/VOCdevkit.
# Parity: reference lib/datasets/scripts/VOC2007.sh.
set -euo pipefail
dest="${1:-data}"
mkdir -p "$dest" && cd "$dest"
base="http://host.robots.ox.ac.uk/pascal/VOC/voc2007"
for f in VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar; do
  [ -f "$f" ] || curl -LO "$base/$f"
  tar -xf "$f"
done
echo "VOC2007 ready under $dest/VOCdevkit"
