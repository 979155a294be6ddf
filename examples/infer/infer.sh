#!/bin/bash
# parity with the reference examples/infer/infer.sh
python examples/start_rlvr_socioseg_pipeline_infer.py --config_path examples/infer --config_name rlvr_tpu.yaml
