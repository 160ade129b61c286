"""CLI argument surface.

Flag-compatible with the reference parser (`tools/_init_parse.py:12-156`):
same names/defaults for the robustness flags (--test_robust
--corruption_type --severity), the AdvMix hyperparameters (--advmix
--sample_times --adv_loss_weight --alpha --gen_input_chn --downsamples
--kd_mseloss --joints_num ...), fine-tune loading (--load_from_D/--load_from_G)
and the --random_corruption baseline.
"""

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train keypoints network (TPU)")
    p.add_argument("--cfg", help="experiment configure file name",
                   required=True, type=str)
    p.add_argument("opts", help="Modify config options from the command line",
                   default=None, nargs=argparse.REMAINDER)

    p.add_argument("--modelDir", type=str, default="")
    p.add_argument("--logDir", type=str, default="")
    p.add_argument("--dataDir", type=str, default="")
    p.add_argument("--prevModelDir", type=str, default="")
    p.add_argument("--save_suffix", type=str, default="")

    # robustness testing
    p.add_argument("--test_robust", default=False, action="store_true")
    p.add_argument("--corruption_type", type=str, default="")
    p.add_argument("--severity", type=int, default=0)

    # i/o roots (corruption dataset builder)
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--load_json_file", type=str, default="")
    p.add_argument("--out_root", type=str, default="res_crop")
    p.add_argument("--out_file", type=str, default="res")

    # train/test
    p.add_argument("--exp_id", type=str, default="")
    p.add_argument("--load_from_G", type=str, default="")
    p.add_argument("--load_from_D", type=str, default="")
    p.add_argument("--sample_times", type=int, default=1)
    p.add_argument("--adv_loss_weight", type=float, default=1)
    # --combine_prob / --perturb_joint / --perturb_range are accepted but
    # (like the reference, which parses and never reads them,
    # tools/_init_parse.py:103-111) intentionally unused
    p.add_argument("--combine_prob", type=float, default=0.2)
    p.add_argument("--perturb_joint", type=float, default=0.2)
    p.add_argument("--perturb_range", type=int, default=5)
    p.add_argument("--sp_style", type=float, default=0)
    p.add_argument("--advmix", default=False, action="store_true")
    p.add_argument("--stylize_image", default=False, action="store_true")
    p.add_argument("--joints_num", type=int, default=17)

    # generator
    p.add_argument("--gen_input_chn", type=int, default=9)
    p.add_argument("--downsamples", type=int, default=6)

    # knowledge distillation (--kd_klloss is accepted-but-unwired exactly
    # like the reference: lib never branches on it)
    p.add_argument("--kd_mseloss", default=False, action="store_true")
    p.add_argument("--kd_klloss", default=False, action="store_true")
    p.add_argument("--alpha", type=float, default=0.1)

    # random corruption baseline
    p.add_argument("--random_corruption", default=False, action="store_true")

    # TPU-native extras
    p.add_argument("--dtype", type=str, default="",
                   help="override TRAIN.DTYPE (float32|bfloat16)")
    p.add_argument("--num_devices", type=int, default=0,
                   help="limit the mesh to the first N devices (0 = all)")

    return p.parse_args(argv)
