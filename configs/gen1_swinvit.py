"""Genuine Swin-V2 ViT backbone on Gen1 — the reference's actual
transformer (swin_transformer_v2.py:659-862, swin_transformerv2('large')),
distinct from the conv network the paper configs call "SwinTransformerV2".
Emits the same fixed adaptive-pooled grid as the ResNet (72/36/18/9);
img_size 576 makes those exact strides 8/16/32/64."""

model = dict(
    type="YOLOv6-SwinV2ViT",
    pretrained=None,
    depth_multiple=1.0,
    width_multiple=1.0,
    backbone=dict(
        type="SwinTransformerV2ViT",
        num_repeats=[1, 3, 4, 6, 3],
        out_channels=[64, 128, 256, 512, 1024],
    ),
    neck=dict(
        type="CSPRepBiFPANNeck",
        num_repeats=[12, 12, 12, 12, 12],
        out_channels=[256, 128, 128, 256, 512],
        csp_e=0.5,
    ),
    head=dict(
        type="EffiDeHead",
        in_channels=[128, 256, 512],
        num_layers=3,
        anchors=1,
        strides=[16, 32, 64],
        atss_warmup_epoch=4,
        iou_type="giou",
        use_dfl=True,
        reg_max=16,
    ),
)

solver = dict(
    optim="SGD",
    lr_scheduler="Cosine",
    lr0=0.0032,
    lrf=0.12,
    momentum=0.843,
    weight_decay=0.00036,
    warmup_epochs=2.0,
    warmup_momentum=0.5,
    warmup_bias_lr=0.05,
)

data_aug = dict(
    hsv_h=0.0138,
    hsv_s=0.664,
    hsv_v=0.464,
    degrees=0.373,
    translate=0.245,
    scale=0.898,
    shear=0.602,
    flipud=0.00856,
    fliplr=0.5,
    mosaic=1.0,
    mixup=0.243,
)

training_mode = "conv_silu"

data = dict(
    height=240,
    width=304,
    num_classes=2,
    names=["car", "pedestrian"],
    num_events=50000,
    img_size=576,
    representation="OptimizedRepresentation",
)
