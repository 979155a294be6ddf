"""SocioSeg evaluation entry — the north-star public API (parity with the
reference's examples/start_rlvr_socioseg_pipeline_infer.py): runs the two-stage
reason→segment loop over the test split and writes iou_acc.txt."""

import argparse

from socioreasoner_tpu.configs.loader import load_config
from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
from socioreasoner_tpu.pipeline.rlvr.build import build_infer_pipeline


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="examples/infer")
    parser.add_argument("--config_name", default="rlvr_tpu.yaml")
    args = parser.parse_args()
    cfg = load_config(SocioSegConfig, f"{args.config_path}/{args.config_name}")
    pipeline = build_infer_pipeline(cfg)
    pipeline.run()


if __name__ == "__main__":
    main()
