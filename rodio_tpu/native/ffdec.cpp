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

// ---------------------------------------------------------------------------
// Re-entrant streaming decode: open a file (or growable path), pull
// interleaved f32 PCM in caller-sized chunks at O(packet) memory — the
// incremental analog of the reference's packet loop
// (src/decoder/symphonia.rs:336-417). Undecodable packets are skipped.
//
// C ABI:
//   void* rtpu_ffs_open(const char* path, unsigned* channels,
//                       unsigned* rate, double* duration_secs);
//   long long rtpu_ffs_read(void* h, float* out, long long max_frames);
//     -> frames written (0 = end of stream, <0 = error)
//   int rtpu_ffs_seek(void* h, double seconds);
//   void rtpu_ffs_close(void* h);
// ---------------------------------------------------------------------------

namespace {

struct FfStream {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_idx = -1;
  unsigned channels = 0;
  unsigned rate = 0;
  bool draining = false;
  bool eof = false;
  std::vector<float> leftover;  // interleaved remainder of the last frame
  size_t leftover_pos = 0;
};

}  // namespace

extern "C" {

void* rtpu_ffs_open(const char* path, unsigned* out_channels,
                    unsigned* out_rate, double* out_duration) {
  av_log_set_level(AV_LOG_ERROR);
  FfStream* s = new FfStream();
  int rc = avformat_open_input(&s->fmt, path, nullptr, nullptr);
  if (rc < 0) {
    delete s;
    return nullptr;
  }
  if (avformat_find_stream_info(s->fmt, nullptr) < 0) goto fail;
  {
    const AVCodec* codec = nullptr;
    s->stream_idx =
        av_find_best_stream(s->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (s->stream_idx < 0 || !codec) goto fail;
    s->ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(
        s->ctx, s->fmt->streams[s->stream_idx]->codecpar);
    if (avcodec_open2(s->ctx, codec, nullptr) < 0) goto fail;
    s->channels = (unsigned)s->ctx->ch_layout.nb_channels;
    s->rate = (unsigned)s->ctx->sample_rate;
    if (s->channels == 0 || s->rate == 0) goto fail;
  }
  s->pkt = av_packet_alloc();
  s->frame = av_frame_alloc();
  *out_channels = s->channels;
  *out_rate = s->rate;
  if (out_duration) {
    *out_duration = s->fmt->duration > 0
                        ? (double)s->fmt->duration / AV_TIME_BASE
                        : -1.0;
  }
  return s;
fail:
  if (s->ctx) avcodec_free_context(&s->ctx);
  if (s->fmt) avformat_close_input(&s->fmt);
  delete s;
  return nullptr;
}

long long rtpu_ffs_read(void* handle, float* out, long long max_frames) {
  FfStream* s = (FfStream*)handle;
  if (!s || max_frames <= 0) return -1;
  const size_t want = (size_t)max_frames * s->channels;
  size_t got = 0;

  // drain the leftover of the previous AVFrame first
  if (s->leftover_pos < s->leftover.size()) {
    size_t n = s->leftover.size() - s->leftover_pos;
    if (n > want) n = want;
    memcpy(out, s->leftover.data() + s->leftover_pos, n * sizeof(float));
    s->leftover_pos += n;
    got += n;
  }

  while (got < want && !s->eof) {
    if (!s->draining) {
      int r = av_read_frame(s->fmt, s->pkt);
      if (r < 0) {
        s->draining = true;
        avcodec_send_packet(s->ctx, nullptr);  // flush
      } else if (s->pkt->stream_index != s->stream_idx) {
        av_packet_unref(s->pkt);
        continue;
      } else {
        avcodec_send_packet(s->ctx, s->pkt);  // errors skipped below
        av_packet_unref(s->pkt);
      }
    }
    int r = avcodec_receive_frame(s->ctx, s->frame);
    if (r == AVERROR(EAGAIN)) {
      if (s->draining) {
        s->eof = true;
        break;
      }
      continue;
    }
    if (r == AVERROR_EOF || r < 0) {
      s->eof = true;
      break;
    }
    std::vector<float> buf;
    if (!append_frame(s->frame, (int)s->channels, buf)) return -2;
    size_t n = buf.size();
    size_t take = want - got < n ? want - got : n;
    memcpy(out + got, buf.data(), take * sizeof(float));
    got += take;
    if (take < n) {
      s->leftover.assign(buf.begin() + take, buf.end());
      s->leftover_pos = 0;
    }
  }
  return (long long)(got / s->channels);
}

int rtpu_ffs_seek(void* handle, double seconds) {
  FfStream* s = (FfStream*)handle;
  if (!s) return -1;
  int64_t ts = (int64_t)(seconds * AV_TIME_BASE);
  int rc = av_seek_frame(s->fmt, -1, ts, AVSEEK_FLAG_BACKWARD);
  if (rc < 0) return rc;
  avcodec_flush_buffers(s->ctx);
  s->draining = false;
  s->eof = false;
  s->leftover.clear();
  s->leftover_pos = 0;
  return 0;
}

void rtpu_ffs_close(void* handle) {
  FfStream* s = (FfStream*)handle;
  if (!s) return;
  if (s->frame) av_frame_free(&s->frame);
  if (s->pkt) av_packet_free(&s->pkt);
  if (s->ctx) avcodec_free_context(&s->ctx);
  if (s->fmt) avformat_close_input(&s->fmt);
  delete s;
}

}  // extern "C"
