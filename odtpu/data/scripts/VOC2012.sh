#!/bin/bash
# Fetch + extract PASCAL VOC2012 trainval into data/VOCdevkit.
set -euo pipefail
dest="${1:-data}"
mkdir -p "$dest" && cd "$dest"
f=VOCtrainval_11-May-2012.tar
[ -f "$f" ] || curl -LO "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/$f"
tar -xf "$f"
echo "VOC2012 ready under $dest/VOCdevkit"
