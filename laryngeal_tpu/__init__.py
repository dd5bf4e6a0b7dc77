"""laryngeal_tpu — TPU-native laryngoscopy video classification framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``shaunliewsmu/ai-laryngeal-video-based-classifier`` (five copy-pasted PyTorch
pipelines) as ONE framework with five model plugins:

- ResNet50-2D + LSTM   (reference: resnet50-2d-lstm/)
- 3D-ResNet50          (reference: resnet50-3d-video/)
- ViViT-B              (reference: vivit_transformer/)
- TimeSformer-B        (reference: timesformer/)
- Video Swin 3D        (reference: videoswintransformer/)

Subpackages
-----------
data        host-side decode + frame samplers + prefetch pipeline
preprocess  jittable resize/normalize/crop transforms (XLA-fused)
models      Flax backbones behind one VideoClassifier interface
ops         Pallas TPU kernels (attention, tubelet embed, window attention)
parallel    mesh + sharding definitions (data/model axes over ICI)
train       train state, step functions, losses, selection policies
evals       metrics (numpy), threshold search, evaluator
infer       single-graph decode->logits predictor, batch mode, AOT export
serve       HTTP inference server with dynamic batching
compat      torch/HF -> Flax weight converters + layout manifests
utils       experiment logger, visualization, tracking, compile cache
cli         main/inference/serve/export preserving the reference flag surface
"""

__version__ = "0.1.0"
