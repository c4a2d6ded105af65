"""Teacher encoders (offline feature-map generation + downstream decoding).

The reference vendors two torch forks (/root/reference/encoders/): an LSeg
fork producing 512-d CLIP-aligned pixel features and a SAM fork producing
256-d image embeddings, both saved as ``<image>_fmap_CxHxW.pt`` per view
(encode_images.py:478-481, export_image_embeddings.py:74-85). Teacher
encoding is offline preprocessing — it runs once per dataset on the host —
so these wrappers keep it in torch (CPU) via transformers checkpoints:

  sam_encoder      facebook/sam-vit-huge image embeddings (256 x 64 x 64)
  clip_pixel       MaskCLIP-style CLIP-aligned per-pixel features (512-d),
                   the LSeg-equivalent teacher when LSeg weights are absent
  sam_decode       masks from RENDERED embeddings via SAM's prompt+mask
                   decoder (the fork's ``features=`` threading,
                   segment_anything/predictor.py:38-98, via transformers'
                   ``image_embeddings=`` argument)

This container has zero network egress: all wrappers require local
checkpoints (HF_HOME cache or *_MODEL_PATH env vars) and raise a clear
error otherwise. Precomputed feature maps (.pt/.npy) are always accepted by
the data layer, so training never depends on these being runnable.
"""
