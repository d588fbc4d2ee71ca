#!/usr/bin/env bash
# Bootstrap: fetch the ActivityNet-Entities data + features the
# pipeline consumes (tools/download_all.sh equivalent; same artifact
# set, README.md:16-20 — annotations, region/frame features, proposal
# h5, detectron weights, GloVe).  ~216 GB total; each section can be
# commented out independently.
set -euo pipefail

DATA_ROOT=${1:-data}
ANET=$DATA_ROOT/anet
mkdir -p "$ANET" "$DATA_ROOT/detectron_weights"

echo "==> annotations (dic/cap json + ANet-Entities references)"
wget -nc -P "$ANET" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/anet_entities_prep.tar.gz
wget -nc -P "$ANET" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/anet_entities_captions.tar.gz
tar -xzf "$ANET"/anet_entities_prep.tar.gz -C "$ANET"
tar -xzf "$ANET"/anet_entities_captions.tar.gz -C "$ANET"

echo "==> region proposals + fc6 features (large!)"
wget -nc -P "$ANET" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/anet_detection_vg_fc6_feat_100rois.h5
wget -nc -P "$ANET" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/fc6_feat_100rois.tar.gz
tar -xzf "$ANET"/fc6_feat_100rois.tar.gz -C "$ANET"

echo "==> frame-wise rgb/motion features"
wget -nc -P "$ANET" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/rgb_motion_1d.tar.gz
tar -xzf "$ANET"/rgb_motion_1d.tar.gz -C "$ANET"

echo "==> detectron weights (fc7 + VG classifier, for transfer_mode cls/both)"
wget -nc -P "$DATA_ROOT/detectron_weights" https://dl.fbaipublicfiles.com/ActivityNet-Entities/ActivityNet-Entities/detectron_weights.tar.gz
tar -xzf "$DATA_ROOT"/detectron_weights/detectron_weights.tar.gz -C "$DATA_ROOT"

echo "==> GloVe 6B (plain text; --glove_file data/glove.6B.300d.txt)"
wget -nc -P "$DATA_ROOT" http://nlp.stanford.edu/data/glove.6B.zip
unzip -n "$DATA_ROOT/glove.6B.zip" glove.6B.300d.txt -d "$DATA_ROOT"

echo "done. Point cfgs/anet_res101_vg_feat_10x100prop.yml at $DATA_ROOT."
