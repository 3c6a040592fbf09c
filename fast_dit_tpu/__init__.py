"""fast_dit_tpu: a TPU-native Diffusion-Transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of fast-DiT
(reference: alexandor91/fast-DiT): class-conditional latent diffusion with
DiT backbones, a DDPM/DDIM process library with timestep respacing, SD-VAE
latent pipelines, checkpoint compatibility with the reference's `.pt` files,
and GSPMD mesh parallelism in place of DDP/NCCL.
"""

__version__ = "0.1.0"
