// cliploader — native clip decoder for the laryngeal_tpu host pipeline.
//
// The reference's host data path re-decodes videos through Python
// (pytorchvideo/PyAV or cv2 seek loops) every epoch; this library is the
// TPU-native replacement: a single sequential libavcodec decode pass that
// gathers only the sampled frame indices, scales with swscale, and emits
// either RGB24 or packed I420 planes (the framework's half-size host->device
// wire format — no colorspace conversion at all when the source is already
// yuv420p, which every h264/mpeg4 laryngoscopy file is).
//
// C ABI (ctypes-friendly):
//   video_props(path, &total, &fps, &w, &h) -> 0 ok
//   clip_decode(path, indices, n, out_w, out_h, fmt, out, &decoded) -> 0 ok
//     fmt: 0 = RGB24 (n, out_h, out_w, 3), 1 = I420 (n, out_h*3/2, out_w)
//     indices must be non-decreasing; duplicates allowed (frame copied).
//
// Build: make -C native   (g++ + pkg-config libavformat/avcodec/avutil/swscale)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~Reader() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) return -4;
    dec = avcodec_alloc_context3(codec);
    if (!dec || avcodec_parameters_to_context(dec, st->codecpar) < 0) return -5;
    // Auto-size decoder threads to the host (frame+slice threading); on a
    // 1-core host this resolves to 1 thread with no overhead, on real
    // multi-core hosts it parallelizes the h264 decode that bounds the
    // end-to-end pipeline.
    dec->thread_count = 0;
    dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }

  AVStream* stream() const { return fmt->streams[stream_index]; }
};

double stream_fps(AVStream* st) {
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  if (r.num <= 0 || r.den <= 0) return 30.0;
  return av_q2d(r);
}

}  // namespace

extern "C" {

int video_props(const char* path, int* total_frames, double* fps, int* width,
                int* height) {
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;
  AVStream* st = r.stream();
  *width = r.dec->width;
  *height = r.dec->height;
  *fps = stream_fps(st);
  int64_t n = st->nb_frames;
  if (n <= 0 && st->duration > 0) {
    n = (int64_t)(st->duration * av_q2d(st->time_base) * (*fps) + 0.5);
  }
  if (n <= 0 && r.fmt->duration > 0) {
    n = (int64_t)((double)r.fmt->duration / AV_TIME_BASE * (*fps) + 0.5);
  }
  *total_frames = (int)n;
  return 0;
}

// fmt: 0 = RGB24, 1 = I420 packed planes.
int clip_decode(const char* path, const int* indices, int n_indices,
                int out_w, int out_h, int fmt_code, uint8_t* out,
                int* decoded_count) {
  if (n_indices <= 0) return -10;
  for (int i = 1; i < n_indices; ++i)
    if (indices[i] < indices[i - 1]) return -11;  // must be non-decreasing

  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;

  const AVPixelFormat dst_fmt =
      fmt_code == 1 ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24;
  const size_t frame_bytes = fmt_code == 1
                                 ? (size_t)out_w * out_h * 3 / 2
                                 : (size_t)out_w * out_h * 3;

  AVFrame* frame = av_frame_alloc();
  AVFrame* scaled = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  scaled->format = dst_fmt;
  scaled->width = out_w;
  scaled->height = out_h;
  av_frame_get_buffer(scaled, 32);

  SwsContext* sws = nullptr;
  int cur = 0;      // index of the next frame the decoder will emit
  int want_i = 0;   // position in indices
  int filled = 0;
  const int last_needed = indices[n_indices - 1];

  auto emit = [&](AVFrame* f) {
    // Copy scaled frame into every output slot whose index == cur.
    while (want_i < n_indices && indices[want_i] == cur) {
      uint8_t* dst = out + (size_t)want_i * frame_bytes;
      if (fmt_code == 1) {
        uint8_t* p = dst;
        av_image_copy_plane(p, out_w, f->data[0], f->linesize[0], out_w, out_h);
        p += (size_t)out_w * out_h;
        av_image_copy_plane(p, out_w / 2, f->data[1], f->linesize[1], out_w / 2,
                            out_h / 2);
        p += (size_t)(out_w / 2) * (out_h / 2);
        av_image_copy_plane(p, out_w / 2, f->data[2], f->linesize[2], out_w / 2,
                            out_h / 2);
      } else {
        av_image_copy_plane(dst, out_w * 3, f->data[0], f->linesize[0],
                            out_w * 3, out_h);
      }
      ++want_i;
      ++filled;
    }
    ++cur;
  };

  auto handle_decoded = [&](AVFrame* f) {
    bool needed = want_i < n_indices && indices[want_i] == cur;
    if (needed) {
      if (!sws) {
        sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                             out_w, out_h, dst_fmt, SWS_BILINEAR, nullptr,
                             nullptr, nullptr);
      }
      sws_scale(sws, f->data, f->linesize, 0, f->height, scaled->data,
                scaled->linesize);
      emit(scaled);
    } else {
      ++cur;
    }
  };

  int err = 0;
  while (cur <= last_needed && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_index) {
      // With frame threading (thread_count=0) the decoder can report
      // EAGAIN while worker threads hold finished frames; the packet must
      // then be RESENT after draining, not dropped — a dropped packet
      // would desync `cur` from the true frame index and silently
      // attribute wrong frames to every later request.
      for (;;) {
        int send_rc = avcodec_send_packet(r.dec, pkt);
        if (send_rc == 0) break;
        if (send_rc != AVERROR(EAGAIN)) {
          err = -20;  // fail fast; the Python wrapper falls back to cv2
          break;
        }
        // EAGAIN: drain at least one frame, then retry the same packet.
        if (avcodec_receive_frame(r.dec, frame) == 0) {
          handle_decoded(frame);
        } else {
          err = -21;  // decoder wedged: no output and no input accepted
          break;
        }
      }
      if (err != 0) {
        av_packet_unref(pkt);
        break;
      }
      while (avcodec_receive_frame(r.dec, frame) == 0) {
        handle_decoded(frame);
        if (cur > last_needed) break;
      }
    }
    av_packet_unref(pkt);
  }
  // Drain (skip after a hard packet error — the wrapper falls back).
  if (err == 0 && cur <= last_needed) {
    avcodec_send_packet(r.dec, nullptr);
    while (cur <= last_needed && avcodec_receive_frame(r.dec, frame) == 0) {
      handle_decoded(frame);
    }
  }

  *decoded_count = filled;
  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_frame_free(&scaled);
  av_packet_free(&pkt);
  return err;
}

}  // extern "C"
