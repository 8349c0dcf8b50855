from mysql_binlog_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    make_media_df,
    decode_image_features,
    sample_video_frames,
)
