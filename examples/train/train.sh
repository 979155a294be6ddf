#!/bin/bash
# parity with the reference examples/train/train.sh
python examples/start_rlvr_socioseg_pipeline.py --config_path examples/train --config_name rlvr_tpu.yaml
