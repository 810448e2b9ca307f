"""mmde_tpu — TPU-native multi-modal monocular depth estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
junnyfilm/multi-modal-monodepth-estimation (reference mounted read-only at
/root/reference): two-frame depth + relative pose estimation with SwinV2 /
CNN-transformer / ResNet encoders, twin-headed decoders, SiLog + pose losses,
the full depth/pose metric suite, and NYU / KITTI / VOID data pipelines
(RGB pairs, dense depth, absolute poses, IMU intervals, undistortion).

Layout:
    geometry    SO(3)/SE(3) algebra (numpy host-side + jax in-graph)
    losses      SiLog / weighted-MSE as masked static-shape reductions
    metrics     depth metric suite + pose MSE / cycle-consistency
    nn/         flax.linen building blocks (swin_v2, resnet, cnn_transformer,
                decoders, glpdepth legacy heads)
    ops/        Pallas TPU kernels (fused window attention) + XLA fallbacks
    models/     model registry / two-frame assembly (IDEDepth equivalent)
    data/       manifest builders, decode+undistort+augment host pipeline,
                IMU interval extraction, fixed-shape batching, prefetch
    train/      optax layer-decay AdamW, poly LR schedule, train/eval loops,
                TTA (flip + shift-window)
    parallel/   device mesh, sharding rules, SPMD train step
    ckpt/       orbax checkpointing + PyTorch checkpoint converters
    utils/      meters, logging, visualization
"""

__version__ = "0.1.0"
