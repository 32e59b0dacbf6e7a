FROM node:20-alpine
WORKDIR /app
COPY front/package.json ./
RUN npm install
EXPOSE 5173
CMD ["npm", "run", "dev", "--", "--host"]
