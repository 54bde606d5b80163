#!/bin/bash
# Fetch the SAM ViT-B weights used for encoder init
# (reference: download_sam_checkpoint.sh)
wget -O sam_vit_b_01ec64.pth \
  https://dl.fbaipublicfiles.com/segment_anything/sam_vit_b_01ec64.pth
