"""Base experiment config (ev-YOLOv6/configs/swinv2_yolov6l6_finetune.py): the paper detector at Gen1, trained from scratch."""


model = dict(
    type="YOLOv6l6",
    pretrained=None,
    depth_multiple=1.0,
    width_multiple=1.0,
    backbone=dict(
        type="SwinTransformerV2",
        num_repeats=[1, 6, 12, 18, 6, 6],
        out_channels=[64, 128, 256, 512, 768, 1024],
        csp_e=0.5,
        fuse_P2=True,
    ),
    neck=dict(
        type="CSPRepBiFPANNeck_P6",
        num_repeats=[12, 12, 12, 12, 12, 12],
        out_channels=[512, 256, 128, 256, 512, 1024],
        csp_e=0.5,
    ),
    head=dict(
        type="EffiDeHead",
        in_channels=[128, 256, 512, 1024],
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

# dataset (data/gen1.yaml equivalent)
data = dict(
    height=240,
    width=304,
    num_classes=2,
    names=["car", "pedestrian"],
    num_events=50000,
    img_size=640,
    representation="OptimizedRepresentation",
)
