#!/bin/bash
cd /root/repo
set -x
S="--steps 1500 --eval_every 300"
timeout 2400 python -m simplerecon_tpu.scripts.sanity_train_synthetic $S --bn_recal 30 --cvjp pallas_bwd > /tmp/norm_ablation/A_pallas_bwd_batch.log 2>&1
timeout 2400 python -m simplerecon_tpu.scripts.sanity_train_synthetic $S --cvjp autodiff > /tmp/norm_ablation/B_autodiff_batch.log 2>&1
timeout 2400 python -m simplerecon_tpu.scripts.sanity_train_synthetic $S --cvjp pallas_bwd --matching_norm group > /tmp/norm_ablation/C_pallas_bwd_group.log 2>&1
timeout 2400 python -m simplerecon_tpu.scripts.sanity_train_synthetic $S --cvjp pallas > /tmp/norm_ablation/D_pallas_fwdonly.log 2>&1
echo ALL_ARMS_DONE
