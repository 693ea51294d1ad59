"""Offline data preparation: ISPRS tilers and superpixel generators."""
