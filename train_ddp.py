"""Multi-device training entry — CLI-compatible alias of train.py
(reference: train_ddp.py:17-94).

The reference needs a separate torchrun/NCCL entry for multi-GPU; here data
parallelism is a property of jit-over-mesh compilation, so this entry just
forwards to train.main (one process drives every local device). Kept so the
reference's train_ddp launch scripts port 1:1; torchrun-style env vars
(LOCAL_RANK etc.) are ignored.
"""
import sys

from train import main

if __name__ == "__main__":
    main(sys.argv[1:])
