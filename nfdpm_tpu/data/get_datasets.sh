#!/usr/bin/env bash
# Dataset fetch helper (counterpart of /root/reference/data/get_datasets.sh,
# which downloads the ImageNet32 archives). Requires network access; this
# development environment has none — run on a connected host, then copy
# $DATA_ROOT to the training machine.
set -euo pipefail

DATA_ROOT="${1:-./datasets}"
mkdir -p "$DATA_ROOT"

echo "==> ImageNet32 (image-net.org small-image archives; requires credentials)"
mkdir -p "$DATA_ROOT/imagenet32"
echo "    Download Imagenet32_train.zip / Imagenet32_val.zip from"
echo "    https://image-net.org/download-images and unzip into"
echo "    $DATA_ROOT/imagenet32/{train,val}/ (reference layout:"
echo "    train/train_data_batch_1..10, val/val_data)."

echo "==> CIFAR-10"
curl -fL -o "$DATA_ROOT/cifar-10-python.tar.gz" \
    https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz
tar -xzf "$DATA_ROOT/cifar-10-python.tar.gz" -C "$DATA_ROOT"

echo "==> MNIST (idx files)"
mkdir -p "$DATA_ROOT/MNIST/raw"
for f in train-images-idx3-ubyte train-labels-idx1-ubyte \
         t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do
  curl -fL -o "$DATA_ROOT/MNIST/raw/$f.gz" \
      "https://storage.googleapis.com/cvdf-datasets/mnist/$f.gz"
done

echo "==> CelebA: requires the aligned-images archive + list_eval_partition.csv"
echo "    (kaggle datasets download jessicali9530/celeba-dataset), unpack to"
echo "    $DATA_ROOT/celeba/img_align_celeba/img_align_celeba + csv alongside."

echo "==> FID/KID extractor weights (optional, for clean-fid-comparable scores)"
WDIR="${NFDPM_TPU_WEIGHTS_DIR:-$HOME/.nfdpm_tpu/weights}"
mkdir -p "$WDIR"
curl -fL -o "$WDIR/pt_inception-2015-12-05-6726825d.pth" \
    https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth
curl -fL -o "$WDIR/ViT-B-32.pt" \
    https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt

echo "Done. Point data.root at $DATA_ROOT."
