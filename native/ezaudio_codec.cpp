// ezaudio-tpu native runtime: compressed-audio codec bridge.
//
// The reference decodes/encodes non-wav formats by SHELLING OUT to the
// ffmpeg binary per file (audiotools/core/ffmpeg.py:87-204 builds command
// lines and reparses stdout).  This image ships the FFmpeg *libraries*
// (libavformat/libavcodec 59) but not the CLI, and a TPU ingest pipeline
// shouldn't fork a process per file anyway — so this module links the
// codec libraries in-process and exposes a plain C ABI for ctypes
// (no pybind11 in the image):
//
//   * ez_codec_probe   — container-level sr/channels/duration,
//   * ez_codec_decode  — any supported format -> float32 (mono or
//                        interleaved), sample-format conversion done here,
//   * ez_codec_encode  — float32 -> mp3/flac/ogg/wav via the matching
//                        muxer+encoder (the reference writes non-wav via
//                        soundfile/ffmpeg; audiotools/core/audio_signal.py).
//
// Resampling is intentionally NOT done here: the Python layer owns the
// polyphase resampler (ezaudio_tpu/audio/resample.py) so wav and mp3 go
// through the identical DSP path.
//
// Build: ezaudio_tpu/data/codec_loader.py (g++ at first use, linking
// -lavformat -lavcodec -lavutil; cached .so next to this file).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// library-level ingest must not chatter on stderr (e.g. "Estimating
// duration from bitrate" on every CBR mp3 without a Xing header)
__attribute__((constructor)) void quiet_logs() {
  av_log_set_level(AV_LOG_ERROR);
}

// One decoded sample (stream s, channel c, frame i) as float, for every
// sample format the stock decoders emit (mp3float: FLTP, flac: S16/S32,
// vorbis/opus: FLTP/FLT, pcm_*: packed ints/floats).
inline float sample_at(const AVFrame* f, int c, int i) {
  const bool planar = av_sample_fmt_is_planar((AVSampleFormat)f->format);
  const int idx = planar ? i : i * f->ch_layout.nb_channels + c;
  const uint8_t* base = planar ? f->extended_data[c] : f->extended_data[0];
  switch (av_get_packed_sample_fmt((AVSampleFormat)f->format)) {
    case AV_SAMPLE_FMT_FLT: {
      float v; memcpy(&v, base + (size_t)idx * 4, 4); return v;
    }
    case AV_SAMPLE_FMT_DBL: {
      double v; memcpy(&v, base + (size_t)idx * 8, 8); return (float)v;
    }
    case AV_SAMPLE_FMT_S16: {
      int16_t v; memcpy(&v, base + (size_t)idx * 2, 2);
      return (float)(v / 32768.0);
    }
    case AV_SAMPLE_FMT_S32: {
      int32_t v; memcpy(&v, base + (size_t)idx * 4, 4);
      return (float)(v / 2147483648.0);
    }
    case AV_SAMPLE_FMT_S64: {
      int64_t v; memcpy(&v, base + (size_t)idx * 8, 8);
      return (float)((double)v / 9223372036854775808.0);
    }
    case AV_SAMPLE_FMT_U8:
      return (float)(((int)base[idx] - 128) / 128.0);
    default:
      return 0.f;
  }
}

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;
  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }
  // 0 on success, negative error code otherwise
  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      return -5;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }
};

}  // namespace

extern "C" {

// Container-level metadata. Returns 0 ok / negative error.  duration may be
// an estimate (VBR without Xing) — decode for the exact count.
int32_t ez_codec_probe(const char* path, int32_t* sr, int32_t* channels,
                       double* duration_s) {
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  const AVCodecParameters* par = d.fmt->streams[d.stream]->codecpar;
  *sr = par->sample_rate;
  *channels = par->ch_layout.nb_channels;
  int64_t dur = d.fmt->streams[d.stream]->duration;
  if (dur > 0) {
    AVRational tb = d.fmt->streams[d.stream]->time_base;
    *duration_s = (double)dur * tb.num / tb.den;
  } else if (d.fmt->duration > 0) {
    *duration_s = (double)d.fmt->duration / AV_TIME_BASE;
  } else {
    *duration_s = -1.0;
  }
  return 0;
}

// Decode a whole file to float32.  mono!=0: downmix (mean over channels)
// and `out` receives frames; mono==0: interleaved frames*channels.
// Returns samples written (>=0), or negative error; -7 = buffer too small
// (out holds max_samples valid samples; retry with a larger buffer).
int64_t ez_codec_decode(const char* path, float* out, int64_t max_samples,
                        int32_t mono, int32_t* sr_out, int32_t* ch_out) {
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  bool overflow = false;
  int ch_seen = 0;

  auto drain = [&]() {
    while (avcodec_receive_frame(d.dec, frame) == 0) {
      const int ch = frame->ch_layout.nb_channels;
      ch_seen = ch;
      const int64_t need =
          mono ? frame->nb_samples : (int64_t)frame->nb_samples * ch;
      if (written + need > max_samples) { overflow = true; return; }
      if (mono) {
        const float inv = 1.0f / (float)ch;
        for (int i = 0; i < frame->nb_samples; ++i) {
          float acc = 0.f;
          for (int c = 0; c < ch; ++c) acc += sample_at(frame, c, i);
          out[written++] = acc * inv;
        }
      } else {
        for (int i = 0; i < frame->nb_samples; ++i)
          for (int c = 0; c < ch; ++c) out[written++] = sample_at(frame, c, i);
      }
    }
  };

  while (!overflow && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream)
      if (avcodec_send_packet(d.dec, pkt) == 0) drain();
    av_packet_unref(pkt);
  }
  if (!overflow) {  // flush decoder-internal delay
    avcodec_send_packet(d.dec, nullptr);
    drain();
  }
  *sr_out = d.dec->sample_rate;
  *ch_out = ch_seen ? ch_seen : d.dec->ch_layout.nb_channels;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return overflow ? -7 : written;
}

// Encode interleaved float32 -> `path`; container chosen from the file
// extension, codec from codec_name ("" = the container's default audio
// codec, e.g. .mp3 -> libmp3lame, .flac -> flac).  bitrate<=0 = codec
// default.  Returns 0 ok / negative error.
int32_t ez_codec_encode(const char* path, const float* pcm, int64_t n_frames,
                        int32_t sr, int32_t channels, const char* codec_name,
                        int32_t bitrate) {
  AVFormatContext* ofmt = nullptr;
  if (avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path) < 0 ||
      !ofmt)
    return -1;

  const AVCodec* codec =
      (codec_name && codec_name[0])
          ? avcodec_find_encoder_by_name(codec_name)
          : avcodec_find_encoder(ofmt->oformat->audio_codec);
  if (!codec) { avformat_free_context(ofmt); return -2; }

  AVCodecContext* enc = avcodec_alloc_context3(codec);
  AVStream* st = avformat_new_stream(ofmt, nullptr);
  if (!enc || !st) { avformat_free_context(ofmt); return -3; }

  enc->sample_rate = sr;
  av_channel_layout_default(&enc->ch_layout, channels);
  enc->time_base = AVRational{1, sr};
  if (bitrate > 0) enc->bit_rate = bitrate;
  // first sample format the encoder supports, preferring float
  enc->sample_fmt = AV_SAMPLE_FMT_NONE;
  if (codec->sample_fmts) {
    for (const AVSampleFormat* p = codec->sample_fmts;
         *p != AV_SAMPLE_FMT_NONE; ++p)
      if (*p == AV_SAMPLE_FMT_FLTP || *p == AV_SAMPLE_FMT_FLT) {
        enc->sample_fmt = *p;
        break;
      }
    if (enc->sample_fmt == AV_SAMPLE_FMT_NONE)
      enc->sample_fmt = codec->sample_fmts[0];
  } else {
    enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
  }
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

  int rc = 0;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  bool header_written = false;
  if (avcodec_open2(enc, codec, nullptr) < 0) { rc = -4; goto done; }
  if (avcodec_parameters_from_context(st->codecpar, enc) < 0) {
    rc = -5;
    goto done;
  }
  st->time_base = enc->time_base;

  if (!(ofmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE) < 0) { rc = -6; goto done; }
  if (avformat_write_header(ofmt, nullptr) < 0) { rc = -7; goto done; }
  header_written = true;

  {
    const int fsize = enc->frame_size > 0 ? enc->frame_size : 4096;
    const bool planar = av_sample_fmt_is_planar(enc->sample_fmt);
    const AVSampleFormat packed = av_get_packed_sample_fmt(enc->sample_fmt);
    int64_t pos = 0, pts = 0;

    auto flush_pkts = [&]() -> int {
      while (true) {
        int r = avcodec_receive_packet(enc, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
        if (r < 0) return r;
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        r = av_interleaved_write_frame(ofmt, pkt);
        av_packet_unref(pkt);
        if (r < 0) return r;
      }
    };

    while (pos < n_frames) {
      const int n = (int)std::min<int64_t>(fsize, n_frames - pos);
      frame->nb_samples = n;
      frame->format = enc->sample_fmt;
      av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
      frame->sample_rate = sr;
      if (av_frame_get_buffer(frame, 0) < 0) { rc = -8; goto done; }
      for (int c = 0; c < channels; ++c) {
        uint8_t* base = planar ? frame->extended_data[c]
                               : frame->extended_data[0];
        for (int i = 0; i < n; ++i) {
          const float v = pcm[(pos + i) * channels + c];
          const size_t idx = planar ? (size_t)i : (size_t)i * channels + c;
          switch (packed) {
            case AV_SAMPLE_FMT_FLT:
              memcpy(base + idx * 4, &v, 4);
              break;
            case AV_SAMPLE_FMT_DBL: {
              double dv = v; memcpy(base + idx * 8, &dv, 8); break;
            }
            case AV_SAMPLE_FMT_S16: {
              float s = v * 32767.f;
              int16_t q = (int16_t)lrintf(fminf(fmaxf(s, -32768.f), 32767.f));
              memcpy(base + idx * 2, &q, 2);
              break;
            }
            case AV_SAMPLE_FMT_S32: {
              double s = (double)v * 2147483647.0;
              int32_t q = (int32_t)llrint(
                  fmin(fmax(s, -2147483648.0), 2147483647.0));
              memcpy(base + idx * 4, &q, 4);
              break;
            }
            default:
              rc = -9;
              goto done;
          }
        }
      }
      frame->pts = pts;
      pts += n;
      pos += n;
      if (avcodec_send_frame(enc, frame) < 0) { rc = -10; goto done; }
      av_frame_unref(frame);
      if (flush_pkts() < 0) { rc = -11; goto done; }
    }
    avcodec_send_frame(enc, nullptr);  // drain
    if (flush_pkts() < 0) rc = -12;
  }

done:
  if (header_written) av_write_trailer(ofmt);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  if (ofmt && !(ofmt->oformat->flags & AVFMT_NOFILE) && ofmt->pb)
    avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return rc;
}

}  // extern "C"
