"""Lite detector: Lite_EffiBackbone + Lite_EffiNeck (efficientrep.py:528-588,
reppan.py:1094-1199) — the reference's mobile variant, 4 unified-96-channel
head levels at strides 8/16/32/64."""

model = dict(
    type="YOLOv6-Lite",
    pretrained=None,
    depth_multiple=1.0,
    width_multiple=1.0,
    backbone=dict(
        type="Lite_EffiBackbone",
        num_repeats=[1, 1, 3, 7, 3],
        out_channels=[24, 32, 64, 128, 256],
    ),
    neck=dict(
        type="Lite_EffiNeck",
        num_repeats=[1, 1, 1, 1],
        out_channels=[96, 96, 96, 96],
    ),
    head=dict(
        type="EffiDeHead",
        in_channels=[96, 96, 96, 96],
        num_layers=4,
        anchors=1,
        strides=[8, 16, 32, 64],
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
    img_size=640,
    representation="OptimizedRepresentation",
)
