// rebvo_native: native runtime components for rebvo_tpu.
//
// TPU-native re-design of the reference's C++ runtime tier (SURVEY.md
// §2.1/§2.5): the compute path lives in JAX/XLA; this library provides
// the host-side native pieces the reference also implements natively —
//
//   * CRC16 (Modbus polynomial) packet integrity (reference
//     src/UtilLib/libcrc.cpp semantics)
//   * fragmented-UDP telemetry transport: fire-and-forget fragments with
//     tag-based reassembly and timeout, lossy realtime semantics
//     (reference src/CommLib/udp_port.cpp semantics)
//   * keyline edge-map quantization to a fixed-point wire format
//     operating directly on the framework's SoA float arrays
//     (reference src/CommLib/net_keypoint.cpp semantics)
//   * an N-player slot-ownership pipeline ring buffer (reference
//     include/UtilLib/pipeline.h semantics)
//   * a multithreaded prefetching dataset frame loader (PNG/PGM ->
//     float32 RGB-sum scale) built on that ring buffer (replaces the
//     reference's DataSetCam + capture thread)
//
// Exported as a plain C API for ctypes binding (no pybind11 in this
// environment).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// CRC16 (Modbus): polynomial 0xA001 reflected, init 0xFFFF.
// ---------------------------------------------------------------------------

uint16_t rn_crc16(const uint8_t* data, int len) {
  uint16_t crc = 0xFFFF;
  for (int i = 0; i < len; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b) {
      if (crc & 1)
        crc = (crc >> 1) ^ 0xA001;
      else
        crc >>= 1;
    }
  }
  return crc;
}

// ---------------------------------------------------------------------------
// Pipeline ring buffer: N slots, P players; slot s is available to
// player p once player (p-1) mod P has released it. Player 0 produces
// into free slots.
// ---------------------------------------------------------------------------

struct RnPipeline {
  int nbuf;
  int nplayers;
  std::vector<int> owner;   // which player may claim each slot next
  std::vector<int> cursor;  // per-player ring cursor
  std::mutex mu;
  std::condition_variable cv;
};

void* rn_pipeline_create(int nbuf, int nplayers) {
  auto* p = new RnPipeline();
  p->nbuf = nbuf;
  p->nplayers = nplayers;
  p->owner.assign(nbuf, 0);
  p->cursor.assign(nplayers, 0);
  return p;
}

void rn_pipeline_destroy(void* h) { delete static_cast<RnPipeline*>(h); }

// Returns the slot index, or -1 on timeout (timeout_ms < 0: block).
int rn_pipeline_request(void* h, int player, int timeout_ms) {
  auto* p = static_cast<RnPipeline*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  int slot = p->cursor[player];
  auto ready = [&] { return p->owner[slot] == player; };
  if (timeout_ms < 0) {
    p->cv.wait(lk, ready);
  } else {
    if (!p->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), ready))
      return -1;
  }
  return slot;
}

void rn_pipeline_release(void* h, int player) {
  auto* p = static_cast<RnPipeline*>(h);
  std::lock_guard<std::mutex> lk(p->mu);
  int slot = p->cursor[player];
  p->owner[slot] = (player + 1) % p->nplayers;
  p->cursor[player] = (slot + 1) % p->nbuf;
  p->cv.notify_all();
}

// ---------------------------------------------------------------------------
// Fragmented UDP transport.
// ---------------------------------------------------------------------------

static const int RN_MAX_FRAG = 32000;

#pragma pack(push, 1)
struct RnFragHeader {
  uint32_t tag;
  uint16_t frag_pos;
  uint16_t frag_num;
  uint32_t frag_size;
  uint32_t pack_size;
};
#pragma pack(pop)

struct RnUdp {
  int fd = -1;
  sockaddr_in peer{};
  uint32_t send_tag = 1;
  // reassembly state per tag
  struct Partial {
    std::vector<uint8_t> data;
    std::vector<bool> have;
    uint32_t got = 0;
    double t0 = 0;
  };
  std::map<uint32_t, Partial> partials;
};

static double rn_now() {
  timeval tv;
  gettimeofday(&tv, nullptr);
  return tv.tv_sec + 1e-6 * tv.tv_usec;
}

void* rn_udp_create(const char* host, int port, int bind_local) {
  auto* u = new RnUdp();
  u->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (u->fd < 0) {
    delete u;
    return nullptr;
  }
  u->peer.sin_family = AF_INET;
  u->peer.sin_port = htons(port);
  inet_aton(host, &u->peer.sin_addr);
  if (bind_local) {
    sockaddr_in local{};
    local.sin_family = AF_INET;
    local.sin_port = htons(port);
    local.sin_addr.s_addr = INADDR_ANY;
    int one = 1;
    setsockopt(u->fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    if (bind(u->fd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) < 0) {
      close(u->fd);
      delete u;
      return nullptr;
    }
  }
  return u;
}

void rn_udp_destroy(void* h) {
  auto* u = static_cast<RnUdp*>(h);
  if (u->fd >= 0) close(u->fd);
  delete u;
}

// Splits `len` bytes into <=RN_MAX_FRAG fragments; fire-and-forget.
int rn_udp_send_fragmented(void* h, const uint8_t* data, int len) {
  auto* u = static_cast<RnUdp*>(h);
  uint32_t tag = u->send_tag++;
  int nfrag = (len + RN_MAX_FRAG - 1) / RN_MAX_FRAG;
  std::vector<uint8_t> buf(sizeof(RnFragHeader) + RN_MAX_FRAG);
  for (int i = 0; i < nfrag; ++i) {
    int off = i * RN_MAX_FRAG;
    int fsz = std::min(RN_MAX_FRAG, len - off);
    RnFragHeader hd{tag, static_cast<uint16_t>(i),
                    static_cast<uint16_t>(nfrag), static_cast<uint32_t>(fsz),
                    static_cast<uint32_t>(len)};
    memcpy(buf.data(), &hd, sizeof(hd));
    memcpy(buf.data() + sizeof(hd), data + off, fsz);
    ssize_t n = sendto(u->fd, buf.data(), sizeof(hd) + fsz, 0,
                       reinterpret_cast<sockaddr*>(&u->peer),
                       sizeof(u->peer));
    if (n < 0) return -1;
  }
  return nfrag;
}

// Receives until a full packet is reassembled or the timeout expires.
// Returns the packet length (copied into out, up to out_cap), 0 on
// timeout, -1 on error. Stale partial packets are discarded after 2 s
// (loss tolerance — no acks, no retransmit).
int rn_udp_recv_fragmented(void* h, uint8_t* out, int out_cap,
                           int timeout_ms) {
  auto* u = static_cast<RnUdp*>(h);
  double deadline = rn_now() + timeout_ms * 1e-3;
  std::vector<uint8_t> buf(sizeof(RnFragHeader) + RN_MAX_FRAG);
  for (;;) {
    double remain = deadline - rn_now();
    if (remain <= 0) return 0;
    timeval tv;
    tv.tv_sec = static_cast<int>(remain);
    tv.tv_usec = static_cast<int>((remain - tv.tv_sec) * 1e6);
    fd_set fds;
    FD_ZERO(&fds);
    FD_SET(u->fd, &fds);
    int r = select(u->fd + 1, &fds, nullptr, nullptr, &tv);
    if (r < 0) return -1;
    if (r == 0) return 0;
    ssize_t n = recv(u->fd, buf.data(), buf.size(), 0);
    if (n < static_cast<ssize_t>(sizeof(RnFragHeader))) continue;
    RnFragHeader hd;
    memcpy(&hd, buf.data(), sizeof(hd));
    if (hd.frag_num == 0 || hd.frag_pos >= hd.frag_num) continue;
    if (hd.frag_size + sizeof(hd) != static_cast<uint32_t>(n)) continue;
    auto& part = u->partials[hd.tag];
    if (part.data.empty()) {
      part.data.resize(hd.pack_size);
      part.have.assign(hd.frag_num, false);
      part.t0 = rn_now();
    }
    uint32_t off = static_cast<uint32_t>(hd.frag_pos) * RN_MAX_FRAG;
    if (off + hd.frag_size > part.data.size()) continue;
    if (!part.have[hd.frag_pos]) {
      memcpy(part.data.data() + off, buf.data() + sizeof(hd), hd.frag_size);
      part.have[hd.frag_pos] = true;
      part.got++;
    }
    if (part.got == hd.frag_num) {
      int len = std::min<int>(part.data.size(), out_cap);
      memcpy(out, part.data.data(), len);
      u->partials.erase(hd.tag);
      return len;
    }
    // garbage-collect stale partials
    for (auto it = u->partials.begin(); it != u->partials.end();) {
      if (rn_now() - it->second.t0 > 2.0)
        it = u->partials.erase(it);
      else
        ++it;
    }
  }
}

// ---------------------------------------------------------------------------
// Keyline edge-map wire format: fixed-point quantization of the SoA
// arrays. Record layout (little endian, 16 bytes):
//   u16 qx, qy        image position * 8 (1/8 px)
//   u16 rho, s_rho    inverse depth * (10000 / k_scale)
//   i32 n_id          chain link (network id)
//   u8  m_num         consecutive-match count (saturated)
//   i8  gx, gy        gradient direction * 127 / |g|
//   u8  pad
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct RnNetKeyline {
  uint16_t qx, qy;
  uint16_t rho, s_rho;
  int32_t n_id;
  uint8_t m_num;
  int8_t gx, gy;
  uint8_t pad;
};
#pragma pack(pop)

static uint16_t rn_sat_u16(float v) {
  if (v < 0) return 0;
  if (v > 65535.0f) return 65535;
  return static_cast<uint16_t>(v + 0.5f);
}

// Quantize n keylines (those with valid[i] != 0). id_map must hold K
// int32s; it receives the slot->net-id mapping (-1 for invalid) so
// chain links can be rewired. Returns the number of emitted records.
int rn_quantize_keylines(const float* x, const float* y, const float* gx,
                         const float* gy, const float* n_m, const float* rho,
                         const float* s_rho, const int32_t* n_id,
                         const int32_t* m_num, const uint8_t* valid, int K,
                         float k_scale, RnNetKeyline* out, int32_t* id_map) {
  float rs = 10000.0f / (k_scale > 1e-9f ? k_scale : 1.0f);
  int n = 0;
  for (int i = 0; i < K; ++i)
    id_map[i] = valid[i] ? n++ : -1;
  n = 0;
  for (int i = 0; i < K; ++i) {
    if (!valid[i]) continue;
    RnNetKeyline& r = out[n];
    r.qx = rn_sat_u16(x[i] * 8.0f);
    r.qy = rn_sat_u16(y[i] * 8.0f);
    r.rho = rn_sat_u16(rho[i] * rs);
    r.s_rho = rn_sat_u16(s_rho[i] * rs);
    int32_t link = n_id[i];
    r.n_id = (link >= 0 && link < K) ? id_map[link] : -1;
    int mn = m_num[i];
    r.m_num = mn < 0 ? 0 : (mn > 255 ? 255 : mn);
    float nm = n_m[i] > 1e-9f ? n_m[i] : 1.0f;
    r.gx = static_cast<int8_t>(127.0f * gx[i] / nm);
    r.gy = static_cast<int8_t>(127.0f * gy[i] / nm);
    r.pad = 0;
    ++n;
  }
  return n;
}

// Inverse transform (for receivers / tests).
void rn_dequantize_keylines(const RnNetKeyline* in, int n, float k_scale,
                            float* x, float* y, float* rho, float* s_rho,
                            int32_t* n_id, int32_t* m_num, float* gx,
                            float* gy) {
  float rs = (k_scale > 1e-9f ? k_scale : 1.0f) / 10000.0f;
  for (int i = 0; i < n; ++i) {
    x[i] = in[i].qx / 8.0f;
    y[i] = in[i].qy / 8.0f;
    rho[i] = in[i].rho * rs;
    s_rho[i] = in[i].s_rho * rs;
    n_id[i] = in[i].n_id;
    m_num[i] = in[i].m_num;
    gx[i] = in[i].gx / 127.0f;
    gy[i] = in[i].gy / 127.0f;
  }
}

int rn_net_keyline_size() { return sizeof(RnNetKeyline); }

// ---------------------------------------------------------------------------
// Prefetching dataset frame loader.
// ---------------------------------------------------------------------------

struct RnFrameRec {
  double t;
  std::string path;
};

struct RnLoader {
  int width = 0, height = 0;
  std::vector<RnFrameRec> recs;
  // ring of decoded frames
  int nbuf = 4;
  std::vector<std::vector<float>> bufs;
  std::vector<double> times;
  std::vector<int> status;  // 1 ok, 0 decode failed
  void* pipe = nullptr;
  std::thread worker;
  std::atomic<bool> quit{false};
  size_t next_read = 0;
};

// Decode PNG or binary PGM(P5) into float32 gray on the RGB-sum scale
// (value * 3 for 8-bit gray). Returns 0 on success.
static int rn_decode_image(const std::string& path, int W, int H,
                           float* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return -1;
  uint8_t magic[8] = {0};
  if (fread(magic, 1, 8, fp) != 8) {
    fclose(fp);
    return -1;
  }
  if (magic[0] == 'P' && magic[1] == '5') {
    // PGM: parse header
    fseek(fp, 0, SEEK_SET);
    char line[256];
    int w = 0, h = 0, maxv = 0, field = 0;
    // skip "P5"
    if (!fgets(line, sizeof(line), fp)) { fclose(fp); return -1; }
    while (field < 3 && fgets(line, sizeof(line), fp)) {
      if (line[0] == '#') continue;
      std::istringstream ss(line);
      int v;
      while (field < 3 && (ss >> v)) {
        if (field == 0) w = v;
        else if (field == 1) h = v;
        else maxv = v;
        ++field;
      }
    }
    if (w != W || h != H || maxv <= 0 || maxv > 255) {
      fclose(fp);
      return -1;
    }
    std::vector<uint8_t> row(w);
    for (int yy = 0; yy < h; ++yy) {
      if (fread(row.data(), 1, w, fp) != static_cast<size_t>(w)) {
        fclose(fp);
        return -1;
      }
      for (int xx = 0; xx < w; ++xx)
        out[yy * W + xx] = 3.0f * row[xx] * (255.0f / maxv);
    }
    fclose(fp);
    return 0;
  }
  if (png_sig_cmp(magic, 0, 8) == 0) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return -1;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    int channels = png_get_channels(png, info);
    if (w != W || h != H) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return -1;
    }
    std::vector<uint8_t> row(static_cast<size_t>(w) * channels);
    for (int yy = 0; yy < h; ++yy) {
      png_read_row(png, row.data(), nullptr);
      if (channels == 1) {
        for (int xx = 0; xx < w; ++xx) out[yy * W + xx] = 3.0f * row[xx];
      } else {
        for (int xx = 0; xx < w; ++xx) {
          const uint8_t* px = &row[static_cast<size_t>(xx) * channels];
          out[yy * W + xx] = static_cast<float>(px[0]) + px[1] + px[2];
        }
      }
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
  }
  fclose(fp);
  return -1;
}

static void rn_loader_worker(RnLoader* L) {
  for (size_t i = 0; i < L->recs.size() && !L->quit; ++i) {
    int slot = -1;
    while (!L->quit &&
           (slot = rn_pipeline_request(L->pipe, 0, 100)) < 0) {
    }
    if (L->quit || slot < 0) break;
    L->status[slot] =
        rn_decode_image(L->recs[i].path, L->width, L->height,
                        L->bufs[slot].data()) == 0;
    L->times[slot] = L->recs[i].t;
    rn_pipeline_release(L->pipe, 0);
  }
}

// csv lines: "timestamp[,filename]" relative to img_dir.
void* rn_loader_open(const char* csv_path, const char* img_dir,
                     double time_scale, int width, int height, int nbuf) {
  auto* L = new RnLoader();
  L->width = width;
  L->height = height;
  L->nbuf = nbuf > 1 ? nbuf : 2;
  std::ifstream fh(csv_path);
  if (!fh) {
    delete L;
    return nullptr;
  }
  std::string line;
  while (std::getline(fh, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::string stamp, fname;
    size_t comma = line.find_first_of(",;");
    if (comma == std::string::npos) {
      stamp = line;
    } else {
      stamp = line.substr(0, comma);
      fname = line.substr(comma + 1);
    }
    auto strip = [](std::string& s) {
      while (!s.empty() && (s.back() == '\r' || s.back() == ' ')) s.pop_back();
      while (!s.empty() && s.front() == ' ') s.erase(s.begin());
    };
    strip(stamp);
    strip(fname);
    if (stamp.empty()) continue;
    if (fname.empty()) fname = stamp + ".png";
    RnFrameRec r;
    r.t = atof(stamp.c_str()) * time_scale;
    r.path = std::string(img_dir) + "/" + fname;
    L->recs.push_back(r);
  }
  L->bufs.assign(L->nbuf, std::vector<float>(
                              static_cast<size_t>(width) * height));
  L->times.assign(L->nbuf, 0.0);
  L->status.assign(L->nbuf, 0);
  L->pipe = rn_pipeline_create(L->nbuf, 2);
  L->worker = std::thread(rn_loader_worker, L);
  return L;
}

int rn_loader_count(void* h) {
  return static_cast<int>(static_cast<RnLoader*>(h)->recs.size());
}

// Copies the next decoded frame into out [H*W]; returns 1 on success,
// 0 when exhausted, -1 on decode failure (frame skipped).
int rn_loader_next(void* h, float* out, double* t) {
  auto* L = static_cast<RnLoader*>(h);
  if (L->next_read >= L->recs.size()) return 0;
  int slot = rn_pipeline_request(L->pipe, 1, -1);
  int ok = L->status[slot];
  if (ok) {
    memcpy(out, L->bufs[slot].data(),
           L->bufs[slot].size() * sizeof(float));
    *t = L->times[slot];
  }
  rn_pipeline_release(L->pipe, 1);
  L->next_read++;
  return ok ? 1 : -1;
}

void rn_loader_close(void* h) {
  auto* L = static_cast<RnLoader*>(h);
  L->quit = true;
  if (L->worker.joinable()) L->worker.join();
  rn_pipeline_destroy(L->pipe);
  delete L;
}

}  // extern "C"
