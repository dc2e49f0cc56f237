#!/bin/bash
# Launch script (ports the reference's scripts/{name}/{kind}.sh; on TPU there
# is no DDP entry -- `python train.py` scales over the local mesh directly).
EXP_NAME=$1

python train.py \
            exp_name=${EXP_NAME} \
            output_dir=outputs \
            platform=TensorBoard \
            task=contact_gen \
            model=cdm \
            diffusion.steps=500 \
            task.train.batch_size=64 \
            task.train.max_steps=300000 \
            task.train.save_every_step=100000 \
            model.arch=Perceiver \
            model.scene_model.use_scene_model=False
