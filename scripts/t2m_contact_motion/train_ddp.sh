#!/bin/bash
# Launch script (ports the reference's scripts/{name}/{kind}.sh; on TPU there
# is no DDP entry -- `python train.py` scales over the local mesh directly).
EXP_NAME=$1

python train.py \
            exp_name=${EXP_NAME} \
            output_dir=outputs \
            platform=TensorBoard \
            task=text_to_motion_contact_motion_gen \
            model=cmdm \
            diffusion.steps=1000 \
            task.dataset.sigma=0.8 \
            task.train.batch_size=32 \
            task.train.max_steps=600000 \
            task.train.save_every_step=100000 \
            task.dataset.train_transforms=['RandomEraseLang','RandomEraseContact','NumpyToTensor'] \
            model.arch='trans_enc' \
            model.data_repr='h3d' \
            model.text_model.max_length=20
