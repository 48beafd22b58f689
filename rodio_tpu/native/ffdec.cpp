// Container/codec decode via the system ffmpeg libraries (libavformat/
// libavcodec 59) — the ingest backend for formats without a bespoke
// decoder (m4a/aac, opus, ...). The reference reaches these through the
// symphonia Rust crate (src/decoder/symphonia.rs); this shim decodes a
// whole in-memory stream to interleaved f32 PCM.
//
// C ABI:
//   int rtpu_ff_decode(const uint8_t* data, size_t len, float** out_pcm,
//                      unsigned* channels, unsigned* rate, uint64_t* frames);
//   (out_pcm is malloc'd; free with rtpu_free from flac.cpp)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct MemCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemCtx* m = (MemCtx*)opaque;
  size_t left = m->len - m->pos;
  size_t n = (size_t)buf_size < left ? (size_t)buf_size : left;
  if (n == 0) return AVERROR_EOF;
  memcpy(buf, m->data + m->pos, n);
  m->pos += n;
  return (int)n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemCtx* m = (MemCtx*)opaque;
  if (whence == AVSEEK_SIZE) return (int64_t)m->len;
  whence &= ~AVSEEK_FORCE;
  int64_t target;
  if (whence == SEEK_SET) target = offset;
  else if (whence == SEEK_CUR) target = (int64_t)m->pos + offset;
  else if (whence == SEEK_END) target = (int64_t)m->len + offset;
  else return -1;
  if (target < 0 || target > (int64_t)m->len) return -1;
  m->pos = (size_t)target;
  return target;
}

// append one AVFrame's samples as interleaved f32
bool append_frame(const AVFrame* fr, int channels, std::vector<float>& out) {
  int n = fr->nb_samples;
  switch (fr->format) {
    case AV_SAMPLE_FMT_FLTP: {
      for (int i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          out.push_back(((const float*)fr->extended_data[c])[i]);
      return true;
    }
    case AV_SAMPLE_FMT_FLT: {
      const float* p = (const float*)fr->extended_data[0];
      out.insert(out.end(), p, p + (size_t)n * channels);
      return true;
    }
    case AV_SAMPLE_FMT_S16P: {
      for (int i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          out.push_back(
              ((const int16_t*)fr->extended_data[c])[i] / 32768.0f);
      return true;
    }
    case AV_SAMPLE_FMT_S16: {
      const int16_t* p = (const int16_t*)fr->extended_data[0];
      for (size_t i = 0; i < (size_t)n * channels; ++i)
        out.push_back(p[i] / 32768.0f);
      return true;
    }
    case AV_SAMPLE_FMT_S32P: {
      for (int i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          out.push_back((float)(((const int32_t*)fr->extended_data[c])[i] /
                                2147483648.0));
      return true;
    }
    case AV_SAMPLE_FMT_S32: {
      const int32_t* p = (const int32_t*)fr->extended_data[0];
      for (size_t i = 0; i < (size_t)n * channels; ++i)
        out.push_back((float)(p[i] / 2147483648.0));
      return true;
    }
    case AV_SAMPLE_FMT_DBLP: {
      for (int i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          out.push_back(
              (float)((const double*)fr->extended_data[c])[i]);
      return true;
    }
    default:
      return false;
  }
}

}  // namespace

extern "C" {

int rtpu_ff_decode(const uint8_t* data, size_t len, float** out_pcm,
                   unsigned* out_channels, unsigned* out_rate,
                   uint64_t* out_frames) {
  av_log_set_level(AV_LOG_ERROR);

  MemCtx mem{data, len, 0};
  const int io_size = 1 << 16;
  uint8_t* io_buf = (uint8_t*)av_malloc(io_size);
  AVIOContext* avio =
      avio_alloc_context(io_buf, io_size, 0, &mem, mem_read, nullptr, mem_seek);
  if (!avio) return -1;

  AVFormatContext* fmt = avformat_alloc_context();
  fmt->pb = avio;
  int rc = avformat_open_input(&fmt, nullptr, nullptr, nullptr);
  if (rc < 0) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
    return -2;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) rc = -3;

  int stream_idx = -1;
  const AVCodec* codec = nullptr;
  if (rc >= 0) {
    stream_idx =
        av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) rc = -4;
  }

  AVCodecContext* ctx = nullptr;
  std::vector<float> pcm;
  unsigned channels = 0, rate = 0;
  if (rc >= 0) {
    ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, fmt->streams[stream_idx]->codecpar);
    if (avcodec_open2(ctx, codec, nullptr) < 0) rc = -5;
  }
  if (rc >= 0) {
    channels = (unsigned)ctx->ch_layout.nb_channels;
    rate = (unsigned)ctx->sample_rate;
    if (channels == 0 || rate == 0) rc = -6;
  }

  if (rc >= 0) {
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    bool draining = false;
    while (true) {
      if (!draining) {
        int r = av_read_frame(fmt, pkt);
        if (r < 0) {
          draining = true;
          avcodec_send_packet(ctx, nullptr);  // flush
        } else if (pkt->stream_index != stream_idx) {
          av_packet_unref(pkt);
          continue;
        } else {
          // skip undecodable packets, like the reference's decode-error
          // skipping (src/decoder/symphonia.rs:366-372)
          avcodec_send_packet(ctx, pkt);
          av_packet_unref(pkt);
        }
      }
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN)) {
        if (draining) break;
        continue;
      }
      if (r == AVERROR_EOF || r < 0) break;
      if (!append_frame(frame, channels, pcm)) {
        rc = -7;
        break;
      }
    }
    av_frame_free(&frame);
    av_packet_free(&pkt);
  }

  if (ctx) avcodec_free_context(&ctx);
  if (fmt) avformat_close_input(&fmt);
  if (avio) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
  }
  if (rc < 0 && rc != -7) return rc;
  if (pcm.empty()) return -8;

  float* out = (float*)malloc(pcm.size() * sizeof(float));
  if (!out) return -9;
  memcpy(out, pcm.data(), pcm.size() * sizeof(float));
  *out_pcm = out;
  *out_channels = channels;
  *out_rate = rate;
  *out_frames = pcm.size() / channels;
  return 0;
}

}  // extern "C"
