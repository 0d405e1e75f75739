"""Embedding/serving layer: the TPU analog of the reference's Android JNI
bindings (android/EKFMonoSlam/jni/EKFNative.cpp)."""
