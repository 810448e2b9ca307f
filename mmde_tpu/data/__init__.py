"""Host-side data pipeline: manifests, decode/undistort/augment, batching."""
