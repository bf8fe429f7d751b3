#!/usr/bin/env bash
# Canonical launch commands (reference run.sh:1-11 equivalents).
# Single-host SPMD: one process drives all local TPU chips; multi-host pods
# set DIST.INITIALIZE True (jax.distributed.initialize) on every host.

# source-only training
python train_src.py -cfg configs/deeplabv2_r101_src_kvasir.yaml OUTPUT_DIR results/kvasir

# adversarial domain adaptation
python train_adv.py -cfg configs/deeplabv2_r101_adv_kvasir_bli.yaml OUTPUT_DIR results/kvasir_bli

# pseudo-label export for self-distillation (stage A)
python test.py -cfg configs/deeplabv2_r101_adv.yaml --saveres \
    PSEUDO_DIR datasets/cityscapes/soft_labels DATASETS.TEST cityscapes_train \
    resume results/gta2city/AsppFada-10

# self-distillation (stage B)
python train_distill.py -cfg configs/deeplabv2_r101_tgt_self_distill.yaml

# evaluation
python test.py -cfg configs/deeplabv2_r101_src_kvasir.yaml -c renders/kvasir.json \
    resume results/kvasir/Aspp-100

# int8 serving evaluation (post-training quantization, calibrated on the
# first TEST.QUANT_CALIB_BATCHES eval batches; see serve/quant.py)
python test.py -cfg configs/deeplabv2_r101_src_kvasir.yaml -c renders/kvasir.json \
    TEST.QUANT int8 resume results/kvasir/Aspp-100

# micro-batched HTTP inference server (TPU-native serving daemon)
python serve.py -cfg configs/deeplabv2_r101_src_kvasir.yaml -c renders/kvasir.json \
    --port 8500 TEST.QUANT int8 resume results/kvasir/Aspp-100

# StableHLO deployment export (self-contained eval artifact)
python export_model.py -cfg configs/deeplabv2_r101_src_kvasir.yaml \
    -o exported/kvasir_deeplab --batch 8 resume results/kvasir/Aspp-100
