"""End-to-end pipelines: rembg -> matting -> quantize, batched + sharded."""
