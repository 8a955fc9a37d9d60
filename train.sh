#!/bin/sh
# reference train.cmd analog: run training, append log
mkdir -p generated_files
python train.py "$@" 2>&1 | tee -a generated_files/training.log
