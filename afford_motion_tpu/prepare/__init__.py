"""Offline data-preparation pipeline (reference: prepare/*, SURVEY.md §2.27).

Sequential CLI stages (driven by prepare.py at the repo root):
1. raw_datasets   — raw AMASS/HUMANISE/PROX -> SMPL-X param pkls
2. smplx_to_vec   — SMPL-X params -> 22-joint position sequences (+ mirror)
3. process_scene  — scene PLYs -> (N, 6) xyz+rgb npy
4. contact_data   — region crop + 8192-pt sampling + per-joint chamfer
                    distance maps -> contact_motion/{motions,contacts},
                    anno.csv
5. split          — train/test/all txt splits
6. target_object_mask — HUMANISE target-object masks for dist_to_target
"""
