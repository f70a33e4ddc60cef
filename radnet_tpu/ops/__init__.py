"""Device-side detection ops: anchors, NMS, target assignment, RoI pooling."""
