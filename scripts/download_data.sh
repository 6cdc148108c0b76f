#!/usr/bin/env bash
# Data fetchers (counterpart of the reference's hicodet/download.sh and
# download/*.sh). This build environment has no egress; run on a connected
# machine. Mirrors the standard sources:
#   HICO-DET images+annotations tarball, V-COCO via MS-COCO 2014, and the
#   OpenKE benchmark archives.
set -euo pipefail
DEST=${1:-./data}
mkdir -p "$DEST"

echo ">> HICO-DET (hico_20160224_det.tar.gz, ~7.5GB)"
echo "   source: https://umich.app.box.com/v/hico-det (official)"
echo "   after download: tar xzf hico_20160224_det.tar.gz -C $DEST/hicodet"
echo "   JSON annotations (instances_train2015.json / instances_test2015.json):"
echo "   https://github.com/fredzzhang/hicodet releases"

echo ">> V-COCO: images are MS-COCO 2014"
echo "   curl -O http://images.cocodataset.org/zips/train2014.zip"
echo "   curl -O http://images.cocodataset.org/zips/val2014.zip"
echo "   annotations: https://github.com/s-gupta/v-coco (build instances_vcoco_*.json)"

echo ">> OpenKE benchmarks (FB15K237, WN18RR, ...)"
echo "   https://github.com/thunlp/OpenKE tree: benchmarks/"

echo ">> Fine-tuned detections (DRG release, used by the reference):"
echo "   see reference download/*.sh for the Google Drive ids"
