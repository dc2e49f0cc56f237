#!/bin/bash
# Launch script (ports the reference's scripts/{name}/{kind}.sh; on TPU there
# is no DDP entry -- `python train.py` scales over the local mesh directly).
EXP_NAME=$1
EXP_DIR=$2

python test.py \
            exp_dir=${EXP_DIR} \
            exp_name=${EXP_NAME} \
            task=text_to_motion_contact_gen model=cdm diffusion.steps=500
